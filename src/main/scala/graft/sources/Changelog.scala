package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types._

import org.apache.hadoop.fs.{Path => HPath}

import graft.model.Model

/** The transcript change stream (binlog/WAL) — derivation + segment layout.
  *
  * The changelog is derived *deterministically* from the driver-provided
  * `events` table with expressions restricted to the Spark∩DuckDB SQL
  * dialect, so the exact same text serves as (a) the engine's input on the
  * Spark side and (b) the DuckDB oracle's input — making the entire
  * pipeline (dedup → merge → snapshot table) checkable end-to-end against
  * a declarative oracle. This mirrors the reference's synthetic fixture
  * (streamreader const/random column generator feeding streamwriter,
  * `/root/reference/streamreader/.../StreamReader.java:95-167`,
  * `core/src/main/job/job.json`) but seedless-deterministic.
  *
  * Key properties baked in:
  *  - ~3 hot conversations absorb ~30% of events (Zipf-ish skew → exercises
  *    salting, like the reference's splitPk hot-table story);
  *  - op mix ≈ 70% I / 25% U / 5% D, decided by a hash-free modular formula;
  *  - `seq` = event_id (globally unique, monotone) — the LWW tiebreak,
  *    ≈ OTS `seq_id` (`MultiVerModeRecordSender.java:135-141`);
  *  - D rows carry a null payload, like OTS delete-row events.
  */
object Changelog {

  /** The derivation, dialect-parameterized (`strType`: STRING for Spark,
    * VARCHAR for DuckDB). Reads from a relation named `events`. */
  def changelogSql(strType: String): String = s"""
    SELECT
      CASE WHEN r < 70 THEN 'I' WHEN r < 95 THEN 'U' ELSE 'D' END AS op,
      conv_id,
      turn_idx,
      CASE WHEN r >= 95 THEN NULL
           WHEN tmod = 0 THEN 'user'
           WHEN tmod = 1 THEN 'assistant'
           ELSE 'tool' END AS role,
      CASE WHEN r >= 95 THEN NULL
           ELSE concat(event_type, '#', CAST(event_id AS $strType)) END AS text,
      CASE WHEN r < 95 AND tmod = 2
           THEN concat('t', CAST(user_id % 7 AS $strType))
           ELSE NULL END AS tool,
      CASE WHEN r >= 95 THEN NULL ELSE ts END AS ts,
      ts AS event_ts,
      event_id AS seq
    FROM (
      SELECT event_id, user_id, event_type, ts,
        concat('c', lpad(CAST(CASE WHEN user_id % 10 < 3 THEN user_id % 3
                                   ELSE user_id % 97 END AS $strType), 4, '0')) AS conv_id,
        CAST(event_id % 25 AS INT) AS turn_idx,
        (event_id * 37 + user_id * 11) % 100 AS r,
        event_id % 3 AS tmod
      FROM events
    ) AS e"""

  def sparkChangelogSql: String = changelogSql("STRING")
  def duckChangelogSql: String = changelogSql("VARCHAR")

  /** DuckDB oracle for the final table state after full replay: per key the
    * last event by (event_ts, seq); keys whose last op is D are absent. */
  def duckFinalStateSql: String = s"""
    WITH ch AS (${duckChangelogSql}),
    ranked AS (
      SELECT ch.*, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY event_ts DESC, seq DESC) AS rn
      FROM ch)
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM ranked WHERE rn = 1 AND op <> 'D'
    ORDER BY conv_id, turn_idx"""

  /** DuckDB oracle for the LWW dedup operator alone (keeps D winners). */
  def duckLwwSql: String = s"""
    WITH ch AS (${duckChangelogSql}),
    ranked AS (
      SELECT ch.*, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY event_ts DESC, seq DESC) AS rn
      FROM ch)
    SELECT op, conv_id, turn_idx, role, text, tool, ts, event_ts, seq
    FROM ranked WHERE rn = 1
    ORDER BY conv_id, turn_idx"""

  /** Derive the changelog DataFrame from `<sfDir>/events.parquet`. */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/events.parquet").createOrReplaceTempView("events")
    spark.sql(sparkChangelogSql)
  }

  /** Single-version / upsert-only CDC shaping (reference S9,
    * `otsstreamreader/.../SingleVerAndUpOnlyModeRecordSender.java:14-60`):
    * one row per PUT/UPDATE, deletes dropped. Our engine deliberately does
    * NOT use this mode on the merge path — the north rule requires deletes
    * applied — but exposes it for consumers that only materialize live
    * upserts (e.g. search-index feeds). */
  def upsertOnly(ch: DataFrame): DataFrame = ch.filter(col("op") =!= "D")

  /** Cell-level change shaping — the reference's multi-version CDC mode
    * (`otsstreamreader/.../MultiVerModeRecordSender.java:41-65`: one output
    * row per changed cell, `op_type ∈ {U, DR}`): I/U events explode into one
    * row per non-null string payload column; D events emit a single
    * delete-row marker with null column. A pure narrow transform
    * (`explode` — no shuffle), so it composes with any downstream sink.
    */
  def cellChanges(ch: DataFrame): DataFrame = {
    val cellCols = Seq("role", "text", "tool")
    val cells = array(cellCols.map(c =>
      struct(lit(c).as("column_name"), col(c).as("value"))): _*)
    val upserts = ch.filter(col("op") =!= "D")
      .select(col("conv_id"), col("turn_idx"), explode(cells).as("cell"),
        col("event_ts"), col("seq"))
      .filter(col("cell.value").isNotNull)
      .select(col("conv_id"), col("turn_idx"),
        col("cell.column_name").as("column_name"), col("cell.value").as("value"),
        lit("U").as("op_type"), col("event_ts"), col("seq"))
    val deletes = ch.filter(col("op") === "D")
      .select(col("conv_id"), col("turn_idx"),
        lit(null).cast("string").as("column_name"),
        lit(null).cast("string").as("value"),
        lit("DR").as("op_type"), col("event_ts"), col("seq"))
    upserts.unionByName(deletes)
  }

  // ---------------------------------------------------------------- binlog

  /** Binlog segment schema = change schema + (shard, seg) partition cols.
    * shard ≈ OTS stream shard (`OTSStreamReaderMasterProxy.java:78-107`):
    * hash of conv_id, so per-key order is per-shard order. seg = WAL
    * segment index by seq range (append-only files).
    */
  def binlogSchema: StructType = StructType(Model.changeSchema.fields.toSeq ++ Seq(
    StructField("shard", IntegerType, nullable = true),
    StructField("seg", IntegerType, nullable = true)))

  /** Write a changelog as partitioned binlog segments:
    * `<dir>/shard=<k>/seg=<j>/part-*.parquet`, one file per (shard, seg).
    * Maintains the [[schemaSidecarPath]] schema sidecar (widening-merge),
    * written BEFORE the data: a crash between the two leaves the sidecar
    * WIDER than the segments — a reader then just sees nulls for the
    * not-yet-written column, whereas the opposite order could leave a
    * STALE (narrow) sidecar that silently drops a new column's values on
    * the next checkpointed stream start. */
  def writeBinlog(df: DataFrame, dir: String, shards: Int, segSize: Long): Unit = {
    val laid = df.withColumn("shard", pmod(hash(col("conv_id")), lit(shards)))
      .withColumn("seg", (col("seq") / lit(segSize)).cast("int"))
    writeSchemaSidecar(dir, laid.schema)
    laid.repartition(col("shard"), col("seg"))
      .write.partitionBy("shard", "seg").mode("append").parquet(dir)
  }

  /** Batch read of the whole binlog (or a seg range for replay windows).
    * Sidecar/footer-merged like [[binlogStream]], so batch replay ingests
    * evolved columns identically to the streaming path (a pinned static
    * schema would silently project new columns away in `mode=batch`). */
  def readBinlog(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(inferBinlogSchema(spark, dir)).parquet(dir)

  /** Streaming tail of the binlog directory. `maxFilesPerTrigger` is the
    * rate/backpressure control — the analogue of the reference's channel
    * byte/record caps (`core/.../transport/channel/Channel.java:176-239`).
    *
    * The source schema is inferred from the binlog's CURRENT files
    * (footer-merged), not pinned to [[binlogSchema]]: a streaming query's
    * schema is fixed for its lifetime (Spark contract), so schema
    * evolution flows through a query RESTART — segments carrying a new
    * column that arrived since the last run widen the source, and the
    * merge path evolves the table (add-column / widen) on the next batch.
    * This is the Iceberg-style evolution story end to end; pinned by
    * SchemaEvolutionSpec's streaming restart test. Falls back to the
    * static schema ONLY for an empty/not-yet-written binlog dir — any
    * other inference failure (corrupt footer, transient FS error,
    * conflicting segment types) propagates, because silently pinning the
    * narrow schema would consume widened segments without their new
    * column, unrecoverably (offsets are checkpointed).
    *
    * Deployment contract: a column added while a query is RUNNING reaches
    * the table only after the restart — roll schema changes by restarting
    * the tail (runStream warns post-run if consumed segments were wider). */
  def binlogStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int): DataFrame = {
    val r: DataStreamReader = spark.readStream
      .schema(inferBinlogSchema(spark, dir))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
    r.parquet(dir)
  }

  /** Binlog schema resolution, in preference order:
    *  1. the `_schema.json` sidecar ([[writeSchemaSidecar]]) — O(1): at
    *     10^5+ WAL segments the footer-merge below reads every footer at
    *     EVERY stream start, and restarts are the documented
    *     schema-evolution mechanism, so that O(segments) driver stall sat
    *     on the production path;
    *  2. footer-merge over all segments — the ground truth, for foreign
    *     binlogs without a sidecar (and the self-healing fallback for a
    *     corrupt one);
    *  3. static [[binlogSchema]] when the dir has no data yet.
    * A sidecar STALER than the segments (possible only if a foreign
    * writer appends without maintaining it) would silently narrow the
    * stream — delete the sidecar or keep it via [[writeSchemaSidecar]];
    * our own [[writeBinlog]] widens it before every data write.
    * See [[binlogStream]] for the failure contract. */
  def inferBinlogSchema(spark: SparkSession, dir: String): StructType =
    readSchemaSidecar(dir).getOrElse {
      try spark.read.option("mergeSchema", "true").parquet(dir).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("Unable to infer schema") ||
              e.getMessage.contains("Path does not exist") ||
              e.getMessage.contains("PATH_NOT_FOUND") ||
              e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") =>
          binlogSchema
      }
    }

  // ------------------------------------------------------------- sidecar

  def schemaSidecarPath(dir: String): java.nio.file.Path =
    localNioPath(dir).resolve("_schema.json")

  private def sidecarHPath(dir: String) =
    graft.plans.Hfs.path(dir, "_schema.json")

  /** Is `dir` a plain local path? (Scheme-less or `file:` — the lock-file
    * serialization below only exists there.) */
  private def isLocalDir(dir: String): Boolean =
    dir.startsWith("/") || {
      val scheme = scala.util.Try(new java.net.URI(dir).getScheme)
        .toOption.flatMap(Option(_))
      scheme.forall(_ == "file")
    }

  /** The java.nio path of a LOCAL dir. An explicit `file:` URI must strip
    * its scheme here — `Paths.get("file:///x")` would treat the whole
    * string as a relative path and the lock/sidecar would land in
    * `$CWD/file:/x/` while Spark (and [[readSchemaSidecar]], which is
    * scheme-aware) resolve the real `/x`. */
  private def localNioPath(dir: String): java.nio.file.Path =
    if (dir.startsWith("file:"))
      java.nio.file.Paths.get(
        new HPath(dir).toUri.getPath) // Hadoop Path normalizes file:/ forms
    else java.nio.file.Paths.get(dir)

  /** Read the schema sidecar if present and parseable; a corrupt sidecar
    * reads as None (the footer-merge fallback is the ground truth, so
    * falling back is safe — unlike a stale-but-parseable one). Resolves
    * the filesystem from the dir's scheme, so a binlog on hdfs:// or an
    * object-store connector reads the same way. */
  def readSchemaSidecar(dir: String): Option[StructType] = {
    val p = sidecarHPath(dir)
    if (!graft.plans.Hfs.isFile(p)) None
    else scala.util.Try(DataType.fromJson(new String(
      graft.plans.Hfs.readBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)).asInstanceOf[StructType]).toOption
  }

  /** Widen the sidecar to cover `dataSchema`: shared columns keep the
    * wider type ([[graft.plans.Icelite.canWiden]] — same rules as table
    * evolution), new columns append as nullable (old segments lack them),
    * and the partition columns (shard, seg) stay last, matching the
    * footer-merged layout. Atomic replace (tmp + move): widening is
    * monotone, so concurrent readers see either schema and both are safe.
    * Incompatible changes throw — the binlog contract matches the table's.
    *
    * The read-widen-move runs under a cross-process lock on a sibling
    * `_schema.lock` file (plus a per-path JVM monitor — JDK FileLocks are
    * per-process): two concurrent [[writeBinlog]] callers each widening
    * with a DIFFERENT new column would otherwise both read the old
    * sidecar and the last move wins, silently losing the other writer's
    * column (a stale-but-parseable sidecar that [[inferBinlogSchema]]
    * prefers over the footer ground truth). Serialized, widenings
    * compose: the second writer re-reads the first's result. */
  def writeSchemaSidecar(dir: String, dataSchema: StructType): Unit =
    if (isLocalDir(dir)) {
      val nioDir = localNioPath(dir)
      java.nio.file.Files.createDirectories(nioDir)
      val monitor = sidecarMonitors.computeIfAbsent(
        nioDir.toAbsolutePath.normalize.toString, _ => new Object)
      monitor.synchronized {
        val lockPath = nioDir.resolve("_schema.lock")
        val ch = java.nio.channels.FileChannel.open(lockPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val lock = ch.lock() // blocks until any other PROCESS releases
          try writeSchemaSidecarLocked(dir, dataSchema)
          finally lock.release()
        } finally ch.close()
      }
    } else {
      // non-local scheme: no POSIX lock exists. The JVM monitor still
      // serializes same-process writers (one capture job = the normal
      // shape); CROSS-process widenings on a remote binlog dir need
      // external serialization — a stale sidecar can only lose a column
      // until the next widening writer re-merges, and readers always have
      // the footer-merge fallback for corrupt/missing sidecars.
      graft.plans.Hfs.mkdirs(graft.plans.Hfs.path(dir))
      val monitor = sidecarMonitors.computeIfAbsent(
        graft.plans.Hfs.qualified(graft.plans.Hfs.path(dir)).toString,
        _ => new Object)
      monitor.synchronized { writeSchemaSidecarLocked(dir, dataSchema) }
    }

  private val sidecarMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def writeSchemaSidecarLocked(dir: String, dataSchema: StructType): Unit = {
    import graft.plans.Icelite.canWiden
    val existing = readSchemaSidecar(dir).getOrElse(StructType(Nil))
    val widened = existing.fields.map { ef =>
      dataSchema.fields.find(_.name == ef.name) match {
        case None => ef
        case Some(nf) if canWiden(nf.dataType, ef.dataType) =>
          ef.copy(nullable = ef.nullable || nf.nullable)
        case Some(nf) if canWiden(ef.dataType, nf.dataType) =>
          nf.copy(nullable = ef.nullable || nf.nullable)
        case Some(nf) => throw new IllegalArgumentException(
          s"incompatible binlog schema change for ${ef.name}: " +
            s"${ef.dataType} -> ${nf.dataType}")
      }
    }
    val added = dataSchema.fields
      .filterNot(f => existing.fieldNames.contains(f.name))
      .map(f => if (existing.fields.isEmpty) f else f.copy(nullable = true))
    val partLast = Seq("shard", "seg")
    val all = (widened.toSeq ++ added.toSeq)
    val merged = StructType(
      all.filterNot(f => partLast.contains(f.name)) ++
        partLast.flatMap(n => all.find(_.name == n)))
    if (isLocalDir(dir)) {
      // local: tmp + ATOMIC_MOVE — readers see the old or new sidecar,
      // never a partial one
      val nioDir = localNioPath(dir)
      java.nio.file.Files.createDirectories(nioDir)
      val tmp = java.nio.file.Files.createTempFile(nioDir, ".schema", ".tmp")
      java.nio.file.Files.writeString(tmp, merged.json)
      java.nio.file.Files.move(tmp, schemaSidecarPath(dir),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      // remote scheme: a direct overwrite — object-store PUTs are atomic
      // per object, and on filesystems where create(overwrite) is not
      // (HDFS truncate-then-write), a reader catching the window parses
      // garbage and falls back to the footer merge by contract
      graft.plans.Hfs.write(sidecarHPath(dir),
        merged.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }
}
