package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.functions.col

import graft.plans.Icelite
import graft.sources.{Changelog, Gen}

/** Two-process multi-writer race: a REAL ingest JVM and a REAL compaction
  * JVM (separate Spark drivers, separate CommitStore instances — no shared
  * JVM state, unlike the `beforeCommit`-seam races in MaintenanceSpec)
  * interleave commits against one table, contended rounds forced via
  * barrier files, and the final state must equal the LWW oracle with the
  * ingest idempotence gate intact. See [[graft.tools.RaceHarness]].
  */
class MultiWriterRaceSpec extends SparkSpec {

  private def diffEmpty(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean = {
    val cols = a.columns.sorted.map(col).toSeq
    val x = a.select(cols: _*); val y = b.select(cols: _*)
    x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty
  }

  // mirrors build.sbt's jdk17AddOpens — the flags spark-submit injects
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two real JVMs (ingest + compaction) interleave commits exactly-once") {
    raceRound(None)
  }

  test("two real JVMs race under the conditional-put CAS store") {
    // same interleaving, but every snapshot publish in BOTH child JVMs
    // goes through the object-store-shaped conditional put (the
    // exclusive-create backend is the cross-process CAS over the shared
    // mount) — proves the seam swap changes nothing about exactly-once
    raceRound(Some(classOf[graft.plans.CasCommitStore].getName))
  }

  private def raceRound(storeSel: Option[String]): Unit = {
    val root = tmpDir(s"race${storeSel.map(_ => "-cas").getOrElse("")}")
    val rounds = 4
    val ch = Gen.changelog(spark, Gen.GenConfig(events = 4000, convs = 40)).cache()
    Changelog.writeBinlog(ch, s"$root/binlog", shards = 2, segSize = 250)
    val barriers = s"$root/barriers"
    Files.createDirectories(Paths.get(barriers))

    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    def spawn(role: String, extra: Seq[String]): Process = {
      val cmd = Seq(javaBin) ++ addOpens ++
        storeSel.map(c => s"-D${graft.plans.CommitStore.SelectProp}=$c").toSeq ++
        Seq("-Xmx3g",
        "-cp", s"$classes:/opt/spark/jars/*", "graft.tools.RaceHarness",
        s"role=$role", s"table=$root/t", s"barriers=$barriers",
        s"rounds=$rounds") ++ extra
      new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true)
        .redirectOutput(new java.io.File(s"$root/$role.out"))
        .start()
    }
    def touch(n: String): Unit =
      Files.write(Paths.get(barriers, n), Array.emptyByteArray)
    def await(procs: Seq[Process], n: String, timeoutMs: Long = 180000L): Unit = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (!Files.exists(Paths.get(barriers, n))) {
        // a dead child never touches its done-file: fail fast with its log
        procs.find(p => !p.isAlive && p.exitValue() != 0).foreach { p =>
          fail(s"harness process died before $n:\n" + Seq("ingest", "compact")
            .map(r => s"--- $r.out ---\n" + scala.util.Try(new String(
              Files.readAllBytes(Paths.get(s"$root/$r.out")))).getOrElse(""))
            .mkString("\n"))
        }
        assert(System.currentTimeMillis() < deadline, s"barrier timeout on $n")
        Thread.sleep(50)
      }
    }

    val ingest = spawn("ingest",
      Seq(s"binlog=$root/binlog", s"checkpoint=$root/ck", "buckets=8"))
    val compact = spawn("compact", Nil)
    val procs = Seq(ingest, compact)
    try {
      touch("go-ingest-0"); await(procs, "done-ingest-0")
      for (i <- 1 until rounds) {
        // contended round: ingest batch i and compaction of round i-1's
        // deltas are in flight TOGETHER; one of the two commits loses the
        // atomic snapshot create and must rebase
        touch(s"go-compact-${i - 1}"); touch(s"go-ingest-$i")
        await(procs, s"done-ingest-$i"); await(procs, s"done-compact-${i - 1}")
      }
      touch(s"go-compact-${rounds - 1}")
      await(procs, s"done-compact-${rounds - 1}")
      assert(ingest.waitFor(60, TimeUnit.SECONDS) && ingest.exitValue() == 0,
        "ingest harness failed:\n" + new String(
          Files.readAllBytes(Paths.get(s"$root/ingest.out"))))
      assert(compact.waitFor(60, TimeUnit.SECONDS) && compact.exitValue() == 0,
        "compact harness failed:\n" + new String(
          Files.readAllBytes(Paths.get(s"$root/compact.out"))))
    } finally procs.foreach(_.destroyForcibly())

    val table = Icelite.load(spark, s"$root/t")
    // exactly-once across both writers: final state = the LWW oracle
    assert(diffEmpty(table.read(), Gen.expectedFinalState(ch)))
    // the gate survived every compaction rebase (copy keeps gate fields)
    val snap = table.snapshot()
    assert(snap.writerId === "race-ingest")
    assert(snap.lastBatchId === (rounds - 1).toLong)
    // both writers actually committed: history carries ingest commits AND
    // maintenance commits (every round compacted at least round i-1's
    // delta files, so none was a no-op)
    val summaries = (1L to snap.snapshotId)
      .map(id => table.snapshotAt(id).summary)
    assert(summaries.count(_.get("maintenance").contains("compact")) === rounds)
    assert(summaries.count(!_.contains("maintenance")) >= rounds)
    // compaction left no delta generation behind at rest
    assert(snap.files.forall(_.kind == "base"))
  }
}
