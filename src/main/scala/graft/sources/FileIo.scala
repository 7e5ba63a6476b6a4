package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Delimited / line-JSON file sources and sinks — the Spark restatement of
  * the reference's unstructured-storage reader/writer family (local txt,
  * FTP, OSS, HDFS text: `txtfilereader/.../TxtFileReader.java`,
  * `plugin-unstructured-storage-util/.../reader/UnstructuredStorageReaderUtil
  * .java:253-345` CSV loop, `:402-520` projection/cast/const columns;
  * writer `UnstructuredStorageWriterUtil.java`).
  *
  * Where the reference enumerates files and parses rows one thread per file
  * with a hand-rolled option set (`fieldDelimiter`, `skipHeader`,
  * `nullFormat`, `compress`, `encoding`, const `value` columns), this maps
  * each option onto Spark's vectorized CSV/JSON sources — file enumeration,
  * split sizing (`spark.sql.files.maxPartitionBytes`), parallel decompress,
  * predicate/column pushdown and malformed-row routing
  * (`columnNameOfCorruptRecord` ≈ the dirty-record collector F8,
  * `core/.../statistics/plugin/task/StdoutPluginCollector.java:21-60`) all
  * come from the engine.
  */
object FileIo {

  /** Reference option set, defaults per
    * `plugin-unstructured-storage-util/.../Constant.java` (delimiter ",",
    * nullFormat "\N") and `Key.java`. `compress`: gzip/bzip2/none — the
    * subset of the reference's list with Spark-native codecs. */
  case class TextOptions(
      delimiter: String = ",",
      header: Boolean = false,
      nullFormat: String = "\\N",
      compress: Option[String] = None,
      encoding: String = "UTF-8",
      /** micro-precision so parquet timestamps round-trip exactly */
      timestampFormat: String = "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Reference write modes (`hdfswriter/.../HdfsWriter.java:82-90`,
    * `txtfilewriter/.../TxtFileWriter.java:94-192`): truncate = clean then
    * write, append = add files, nonConflict = fail if the target exists. */
  def saveMode(writeMode: String): SaveMode = writeMode match {
    case "truncate"    => SaveMode.Overwrite
    case "append"      => SaveMode.Append
    case "nonConflict" => SaveMode.ErrorIfExists
    case other => throw new IllegalArgumentException(s"writeMode: $other")
  }

  private def csvCommon(o: TextOptions): Map[String, String] = Map(
    "sep" -> o.delimiter,
    "header" -> o.header.toString,
    "nullValue" -> o.nullFormat) ++
    // only pass encoding when non-default: an explicit charset (even UTF-8)
    // flips Spark's CSV onto the per-line decode path, which stops counting
    // structurally-excess rows as malformed (breaks DROPMALFORMED/_corrupt)
    (if (o.encoding.equalsIgnoreCase("UTF-8")) Map.empty
     else Map("encoding" -> o.encoding))

  def writeCsv(df: DataFrame, path: String, o: TextOptions = TextOptions(),
      writeMode: String = "truncate"): Unit =
    df.write.options(csvCommon(o))
      // write full microseconds (both tz'd and NTZ timestamps); reads use
      // Spark's lenient ISO parser (an explicit read-side pattern would
      // truncate micros to millis)
      .option("timestampFormat", o.timestampFormat)
      .option("timestampNTZFormat", o.timestampFormat)
      .option("compression", o.compress.getOrElse("none"))
      .mode(saveMode(writeMode)).csv(path)

  /** Schema-d CSV scan. `constCols` replicates the reference's constant
    * `{value: ...}` column specs (`UnstructuredStorageReaderUtil.java:
    * 434-449`) as `lit()` projections.
    *
    * `keepCorrupt = false` (default): malformed rows are dropped
    * (DROPMALFORMED). `keepCorrupt = true`: PERMISSIVE mode with the raw
    * malformed line kept in a `_corrupt` string column — the F8
    * dirty-collection analogue; route `_corrupt IS NOT NULL` rows to a
    * dead-letter sink and filter them out of the clean path. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      o: TextOptions = TextOptions(),
      constCols: Seq[(String, Column)] = Nil,
      keepCorrupt: Boolean = false): DataFrame = {
    val reader = spark.read.options(csvCommon(o))
    val base =
      if (keepCorrupt)
        // cached: Spark refuses filters that reference only the corrupt
        // column of a raw file scan, and the dirty-split pattern reads the
        // batch twice (clean + dead-letter) anyway
        reader.option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .schema(schema.add("_corrupt", org.apache.spark.sql.types.StringType))
          .csv(path).cache()
      else reader.option("mode", "DROPMALFORMED").schema(schema).csv(path)
    constCols.foldLeft(base) { case (df, (name, c)) => df.withColumn(name, c) }
  }

  def writeJsonl(df: DataFrame, path: String, o: TextOptions = TextOptions(),
      writeMode: String = "truncate"): Unit =
    df.write
      // micros on write; read side uses the lenient ISO parser (see writeCsv)
      .option("timestampFormat", o.timestampFormat)
      .option("timestampNTZFormat", o.timestampFormat)
      .option("compression", o.compress.getOrElse("none"))
      .mode(saveMode(writeMode)).json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      o: TextOptions = TextOptions()): DataFrame =
    spark.read
      .option("encoding", o.encoding)
      // no timestampFormat on read: the lenient ISO parser keeps micros
      .option("mode", "DROPMALFORMED")
      .schema(schema).json(path)

  /** Columnar warehouse-file formats (reference S4/W5: hdfsreader/hdfswriter
    * ORC path, `hdfsreader/.../HdfsReader.java:80-86`). Parquet is the
    * engine's native format; ORC round-trips through Spark's vectorized
    * ORC source. */
  def writeOrc(df: DataFrame, path: String, writeMode: String = "truncate"): Unit =
    df.write.mode(saveMode(writeMode)).orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
