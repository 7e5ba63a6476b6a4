package graft.tools

import graft.Bench

/** North-rule scaling evidence with REAL executor processes: the same
  * replay job spark-submitted at two cluster sizes — N and 4N executors —
  * using Spark's `local-cluster[E,cores,memMB]` master, which launches E
  * separate executor JVMs (own heaps, own GC, task dispatch over RPC)
  * against the shared tmpfs "distributed" store. This is the sandbox's
  * closest analogue to a multi-executor cluster scale-up: unlike
  * `local[N]` thread scaling, per-executor memory and JVM overheads stay
  * constant while the executor COUNT changes, exactly like adding nodes.
  * (What it cannot multiply is the box's DRAM bandwidth — the hw ceiling
  * measured alongside in `graft.Bench` bounds that; a real 4N-node
  * cluster adds memory channels with cores.)
  *
  * [[ClusterScaling.measure]] writes the shared binlog, then shells out
  * to `spark-submit` once per cluster size, running [[ClusterScalingRun]]
  * inside each cluster; it parses the reported wall times and returns the
  * throughput + efficiency. [[graft.Bench]] embeds the result in its JSON
  * (`cluster_scaling` key) so the per-round bench artifact carries the
  * north-rule evidence; [[ClusterScalingBench]] is the standalone CLI.
  *
  * Usage: sbt -batch "runMain graft.tools.ClusterScalingBench [events] [execsLow] [execsHigh] [coresPerExec]"
  *        (defaults: 4*10^7 events, 1 -> 4 executors x 4 cores; the app
  *        jar is zipped fresh from target/scala-2.13/classes)
  */
object ClusterScaling {

  /** A measured scaling efficiency above this is physically impossible
    * (4× the executors cannot beat 4× the throughput on the same input;
    * a small grace covers measurement jitter) — it means a steal storm
    * degraded the LOW leg's window. Such samples are recorded in full but
    * flagged invalid and NEVER headline (round-3 verdict: a 1.083
    * super-linear artifact must not be reported as PASS evidence). */
  val MaxPlausibleEfficiency = 1.02

  /** `thrLow/thrHigh` = best per-batch (steady-state) throughput (the
    * `statistic: best_batch` fields); `runThrLow/runThrHigh` = whole-run
    * totals (events / best run wall). A single sample carries its own
    * strict `run_efficiency` and a `valid` storm flag; the HEADLINE
    * `efficiency` key exists only on the aggregated output
    * ([[appendAndAggregate]]) = median of VALID history samples, clamped
    * to 1.0 — never a single window's ratio. The best-batch ratio
    * (per-level maxima over non-contemporaneous windows, optimistic by
    * construction) reports under `best_batch_efficiency` only. */
  final case class Result(events: Long, coresPerExec: Int, execsLow: Int,
      execsHigh: Int, thrLow: Double, thrHigh: Double,
      runThrLow: Double, runThrHigh: Double,
      tsMs: Long = System.currentTimeMillis()) {
    def bestBatchEfficiency: Double =
      (thrHigh / thrLow) / (execsHigh.toDouble / execsLow)
    def runEfficiency: Double =
      (runThrHigh / runThrLow) / (execsHigh.toDouble / execsLow)
    /** Storm check: a super-linear run-total ratio is impossible, so the
      * sample's low leg was degraded — keep the data, flag the sample. */
    def valid: Boolean = runEfficiency > 0 && runEfficiency <= MaxPlausibleEfficiency
    /** Inner JSON object (no outer key; no headline `efficiency` — that
      * is an aggregate-only statistic, see [[appendAndAggregate]]). */
    def json: String =
      f"""{"mode":"local-cluster","statistic":"best_batch","ts_ms":$tsMs,""" +
        f""""events":$events,""" +
        f""""cores_per_executor":$coresPerExec,"executors_low":$execsLow,""" +
        f""""executors_high":$execsHigh,"thr_low":$thrLow%.0f,""" +
        f""""thr_high":$thrHigh%.0f,"valid":$valid,""" +
        f""""best_batch_efficiency":$bestBatchEfficiency%.3f,""" +
        f""""run_thr_low":$runThrLow%.0f,"run_thr_high":$runThrHigh%.0f,""" +
        f""""run_efficiency":$runEfficiency%.3f}"""
  }

  /** Parse the headline `efficiency` key out of an
    * [[appendAndAggregate]] result (for gates/prints). */
  def headlineEfficiency(json: String): Option[Double] = {
    import org.json4s._
    implicit val fmts: DefaultFormats = DefaultFormats
    scala.util.Try(org.json4s.jackson.JsonMethods.parse(json) \ "efficiency")
      .toOption.flatMap(_.extractOpt[Double])
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** History JSONL location: explicit env override, else next to the
    * bench output file, else the working directory — library code must
    * not hardcode an absolute repo path (it is a side effect any caller
    * of measure-then-aggregate performs). */
  def defaultHistoryPath: String =
    sys.env.get("SPARK_GRAFT_CLUSTER_HISTORY").getOrElse {
      sys.env.get("SPARK_GRAFT_CLUSTER_BENCH_OUT")
        .flatMap(o => Option(java.nio.file.Paths.get(o).toAbsolutePath.getParent))
        .map(_.resolve("BENCH_cluster_history.jsonl").toString)
        .getOrElse("BENCH_cluster_history.jsonl")
    }

  /** Append this run to the measurement history (JSONL) and return the
    * run's JSON extended with the HEADLINE and an `aggregate` over all
    * history runs of the SAME configuration (events, cores, executor
    * levels, AND the `best_batch` statistic — rows measuring a different
    * statistic never mix in).
    *
    * Headline `efficiency` = median of the VALID samples' strict
    * run-total efficiencies, clamped to 1.0 — a storm-degraded window
    * (super-linear sample, [[MaxPlausibleEfficiency]]) is retained in the
    * history but can never headline, and by construction the headline
    * never reports impossible super-linear scaling. Legacy history lines
    * without a `valid` flag are classified by the same rule from their
    * recorded `run_efficiency`.
    *
    * The aggregate also carries per-level MAX best-batch throughput and
    * the efficiency of those maxima (`best_of_history_efficiency`) — an
    * UPPER-BOUND estimate (maxima taken independently per level, across
    * windows), audit material for this VM's multi-minute steal storms,
    * never a headline. Every sample is retained in the history file.
    * History IO failures degrade gracefully: the run's own JSON is
    * returned without headline or aggregate. */
  def appendAndAggregate(r: Result,
      histPath: String = defaultHistoryPath): String = scala.util.Try {
    val p = java.nio.file.Paths.get(histPath)
    Option(p.toAbsolutePath.getParent)
      .foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, (r.json + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: DefaultFormats = DefaultFormats
    val samples = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .linesIterator
      .flatMap(l => scala.util.Try(JsonMethods.parse(l)).toOption)
      .filter { j =>
        (j \ "statistic").extractOpt[String].contains("best_batch") &&
          (j \ "events").extractOpt[Long].contains(r.events) &&
          (j \ "cores_per_executor").extractOpt[Int].contains(r.coresPerExec) &&
          (j \ "executors_low").extractOpt[Int].contains(r.execsLow) &&
          (j \ "executors_high").extractOpt[Int].contains(r.execsHigh)
      }
      .flatMap { j =>
        for {
          lo <- (j \ "thr_low").extractOpt[Double]
          hi <- (j \ "thr_high").extractOpt[Double]
          runEff <- (j \ "run_efficiency").extractOpt[Double]
        } yield {
          val valid = (j \ "valid").extractOpt[Boolean]
            .getOrElse(runEff > 0 && runEff <= MaxPlausibleEfficiency)
          (lo, hi, runEff, valid, (j \ "ts_ms").extractOpt[Long].getOrElse(0L))
        }
      }.toSeq
    require(samples.nonEmpty,
      s"no parseable best_batch samples for this config in $histPath " +
        "(format drift? the line just appended should always match)")
    val validEffs = samples.filter(_._4).map(_._3)
    val loMax = samples.map(_._1).max
    val hiMax = samples.map(_._2).max
    val aggEff = (hiMax / loMax) / (r.execsHigh.toDouble / r.execsLow)
    val tss = samples.map(_._5).filter(_ > 0)
    val headline =
      if (validEffs.isEmpty) """"efficiency":null,"""
      else f""""efficiency":${math.min(1.0, median(validEffs))}%.3f,"""
    r.json.stripSuffix("}") + "," +
      headline +
      """"efficiency_statistic":"median_valid_run_total",""" +
      f""""aggregate":{"runs":${samples.size},""" +
      f""""valid_runs":${validEffs.size},""" +
      f""""invalid_runs":${samples.size - validEffs.size},""" +
      (if (tss.nonEmpty) s""""ts_ms_first":${tss.min},"ts_ms_last":${tss.max},"""
       else "") +
      f""""thr_low_best":$loMax%.0f,"thr_high_best":$hiMax%.0f,""" +
      f""""best_of_history_efficiency":$aggEff%.3f}}"""
  }.recover { case e =>
    System.err.println(s"[cluster-scaling] history aggregate unavailable " +
      s"($histPath): ${e.getMessage}")
    r.json
  }.get

  /** The spark-submitted application jar. Preference: explicit
    * `SPARK_GRAFT_JAR`; else a jar zipped fresh from the compiled classes
    * directory (always in sync with the code just built — a stale
    * `sbt package` artifact would silently measure old code). Spark and
    * commons-io come from /opt/spark/jars on the submit classpath, so the
    * app jar only needs the graft classes. */
  def appJar(workDir: String): String = {
    sys.env.get("SPARK_GRAFT_JAR").filter(j => new java.io.File(j).isFile)
      .getOrElse {
        val classes = java.nio.file.Paths.get("target/scala-2.13/classes")
        require(java.nio.file.Files.isDirectory(classes),
          s"no compiled classes at $classes — run from the repo root after compile")
        val jar = java.nio.file.Paths.get(workDir, "graft-app.jar")
        val zos = new java.util.zip.ZipOutputStream(
          java.nio.file.Files.newOutputStream(jar))
        try {
          val files = java.nio.file.Files.walk(classes).iterator()
          while (files.hasNext) {
            val p = files.next()
            if (java.nio.file.Files.isRegularFile(p)) {
              zos.putNextEntry(new java.util.zip.ZipEntry(
                classes.relativize(p).toString.replace('\\', '/')))
              java.nio.file.Files.copy(p, zos)
              zos.closeEntry()
            }
          }
        } finally zos.close()
        jar.toString
      }
  }

  /** Run the replay job at `execsLow` and `execsHigh` executors over the
    * same `events`-row binlog; returns measured throughput at both.
    * Spark sessions: caller must have NO active session (each level gets
    * its own cluster). */
  def measure(events: Long, execsLow: Int, execsHigh: Int, cores: Int,
      reps: Int = sys.env.getOrElse("SPARK_GRAFT_SCALING_REPS", "2").toInt,
      interleavingsOpt: Option[Int] = None): Result = {
    val memMb = sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM_MB", "4096").toInt
    val submit = sys.env.getOrElse("SPARK_HOME", "/opt/spark") + "/bin/spark-submit"
    require(new java.io.File(submit).canExecute, s"no spark-submit at $submit")

    // shared inputs, written once by an embedded session
    val work = Bench.workDir("graft-cluster-scaling")
    val jar = appJar(work)
    val s0 = Bench.session(Runtime.getRuntime.availableProcessors())
    s0.sparkContext.setLogLevel("WARN")
    val binlog = Bench.writeBenchBinlog(s0, events, hotPct = 0, work)
    s0.stop()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()

    /** @return (best run wall secs, best per-batch events/s) */
    def runLevel(execs: Int): (Double, Double) = {
      // per-executor JIT warmup must be EQUAL across levels: one warmup
      // pass spreads its tasks over E executor JVMs, so each JVM warms E×
      // slower — without this, the high level is measured cold and the
      // efficiency under-reports (observed: 4-exec reps still dropping
      // 30→26→20 s while 1-exec had converged)
      val warmups = math.max(1, execs / execsLow)
      val cmd = Seq(submit,
        "--master", s"local-cluster[$execs,$cores,$memMb]",
        "--conf", "spark.driver.memory=4g",
        "--conf", s"spark.executor.memory=${memMb}m",
        "--conf", "spark.ui.enabled=false",
        "--class", "graft.tools.ClusterScalingRun", jar,
        binlog, s"$work/run-$execs", (execs * cores).toString, reps.toString,
        warmups.toString)
      println(s"[cluster-scaling] ${cmd.mkString(" ")}")
      val out = new StringBuilder
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      var line = br.readLine()
      while (line != null) {
        if (line.contains("[cluster-run]")) { println(line); out.append(line).append('\n') }
        else if (line.contains("[merge-timing]")) println(line) // GRAFT_MERGE_TIMING=1
        line = br.readLine()
      }
      p.waitFor()
      require(p.exitValue() == 0, s"spark-submit failed for $execs executors")
      // per-BATCH statistic: steady-state rate a 10^10 deployment's
      // thousands of triggers run at; robust to this VM's steal storms,
      // which a run total integrates. The summary line must carry BOTH
      // statistics — no fallback that would silently mix throughput
      // definitions into the best_batch history.
      val summary = out.toString.linesIterator
        .collectFirst { case l if l.contains("best=") => l }
        .getOrElse(sys.error(s"no [cluster-run] best= line for $execs executors"))
      require(summary.contains("best_batch_thr="),
        s"cluster-run summary lacks best_batch_thr= (stale app jar?): $summary")
      val bestSecs = summary.split("best=")(1).trim.split("\\s+")(0).toDouble
      val bestBatchThr = summary.split("best_batch_thr=")(1).trim.toDouble
      (bestSecs, bestBatchThr)
    }

    // INTERLEAVE the two cluster sizes (low,high,low,high,...) and keep the
    // best wall time per level: this VM has multi-second steal storms, and
    // levels run minutes apart would sample different weather — one
    // degraded level skews the ratio either way (observed: a stalled
    // 1-exec level once measured a nonsense 1.22 "super-linear"
    // efficiency). Best-of-interleavings approximates quiet-machine
    // conditions for BOTH levels from the same wall-clock window.
    val interleavings = interleavingsOpt.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CLUSTER_INTERLEAVE", "2").toInt)
    require(interleavings >= 1,
      s"interleavings must be >= 1 (got $interleavings) — 0 would emit " +
        "zero-throughput levels and NaN efficiency")
    try {
      var secsLow = Double.MaxValue
      var secsHigh = Double.MaxValue
      var batchLow = 0.0
      var batchHigh = 0.0
      for (_ <- 1 to interleavings) {
        val (sl, bl) = runLevel(execsLow)
        secsLow = math.min(secsLow, sl); batchLow = math.max(batchLow, bl)
        val (sh, bh) = runLevel(execsHigh)
        secsHigh = math.min(secsHigh, sh); batchHigh = math.max(batchHigh, bh)
      }
      Result(events, cores, execsLow, execsHigh,
        thrLow = batchLow, thrHigh = batchHigh,
        runThrLow = events / secsLow, runThrHigh = events / secsHigh)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
  }
}

/** Standalone CLI for [[ClusterScaling.measure]]; also writes the result
  * to `BENCH_cluster.json` (env `SPARK_GRAFT_CLUSTER_BENCH_OUT`).
  * GATES on the HEADLINE statistic — median of valid strict run-total
  * efficiencies across the retained history ≥ 0.8 (the north rule's bar)
  * — printing PASS/FAIL and exiting nonzero on FAIL. A storm-invalidated
  * sample (super-linear ratio) can neither pass NOR fail the gate by
  * itself: it is recorded, flagged, and the valid-history median decides. */
object ClusterScalingBench {
  def main(args: Array[String]): Unit = {
    val events = if (args.length > 0) args(0).toLong else 40000000L
    val execsLow = if (args.length > 1) args(1).toInt else 1
    val execsHigh = if (args.length > 2) args(2).toInt else 4 * execsLow
    val cores = if (args.length > 3) args(3).toInt else 4
    val r = ClusterScaling.measure(events, execsLow, execsHigh, cores)
    println(f"[cluster-scaling] ${r.execsLow} execs: ${r.runThrLow}%.0f ev/s; " +
      f"${r.execsHigh} execs: ${r.runThrHigh}%.0f ev/s (run-total); " +
      f"best-batch ${r.thrLow}%.0f -> ${r.thrHigh}%.0f ev/s; " +
      f"sample run_efficiency=${r.runEfficiency}%.3f valid=${r.valid}")
    val inner = ClusterScaling.appendAndAggregate(r)
    val json = s"""{"cluster_scaling":$inner}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_CLUSTER_BENCH_OUT",
      "BENCH_cluster.json")
    scala.util.Try {
      val p = java.nio.file.Paths.get(out)
      Option(p.toAbsolutePath.getParent)
        .foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
    }.recover { case e =>
      System.err.println(s"[cluster-scaling] could not write $out: ${e.getMessage}")
    }
    // gate on the headline (median of valid history samples); if history
    // was unavailable, fall back to this sample's own strict ratio — but
    // only when the sample is storm-free
    val headline = ClusterScaling.headlineEfficiency(inner)
      .orElse(if (r.valid) Some(r.runEfficiency) else None)
    val pass = headline.exists(_ >= 0.8)
    println(f"[cluster-scaling] GATE efficiency=" +
      headline.map(h => f"$h%.3f").getOrElse("n/a (no valid samples)") +
      f" (median of valid run-total history; this sample " +
      f"run_efficiency=${r.runEfficiency}%.3f valid=${r.valid}, " +
      f"best_batch_efficiency=${r.bestBatchEfficiency}%.3f) " +
      s"=> ${if (pass) "PASS" else "FAIL"} (target >= 0.8)")
    if (!pass) sys.exit(1)
  }
}

/** The in-cluster half: replays the shared binlog through the full
  * exactly-once merge pipeline on whatever cluster spark-submit built.
  * `warmups` untimed reps first (JIT + codegen — per-executor, see
  * [[ClusterScaling.measure]]), then best-of-`reps` timed.
  * Args: binlog workDir totalCores [reps] [warmups].
  * Prints `[cluster-run] best=S`.
  */
object ClusterScalingRun {
  def main(args: Array[String]): Unit = {
    val Array(binlog, work, coresStr) = args.take(3)
    val reps = if (args.length > 3) args(3).toInt else 3
    val warmups = if (args.length > 4) args(4).toInt else 1
    val cores = coresStr.toInt
    // master/memory come from spark-submit; SQL tuning mirrors Bench.session
    val spark = org.apache.spark.sql.SparkSession.builder()
      .appName("graft-cluster-scaling-run")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "16000000")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "8m")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val runs = (0 until warmups + reps).map { r =>
      val res = Bench.replayBinlog(spark, binlog, s"$work/r$r", cores,
        verifyCount = false)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$work/r$r"))
      val kind = if (r < warmups) "warmup" else "timed"
      val batchMs = res.batchStats.map(_.wallMs).mkString(",")
      println(f"[cluster-run] rep $r ($kind): ${res.secs}%.2f s rows=${res.rows} " +
        f"spillMB=${(res.spillDiskBytes + res.spillMemBytes) / 1e6}%.1f " +
        f"shufMB=${res.shuffleWriteBytes / 1e6}%.1f batch_ms=[$batchMs]")
      res
    }.drop(warmups)
    println(f"[cluster-run] best=${runs.map(_.secs).min}%.3f " +
      f"best_batch_thr=${runs.map(_.bestBatchEventsPerSec).max}%.0f")
    spark.stop()
  }
}
