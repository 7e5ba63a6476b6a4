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
    "nullValue" -> o.nullFormat,
    "encoding" -> o.encoding)

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
    * 434-449`) as `lit()` projections. `dirtyTo`: rows that fail the schema
    * land in a `_corrupt` column and are split out (PERMISSIVE mode), the
    * F8 dirty-collection analogue — pass None to drop them (DROPMALFORMED).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      o: TextOptions = TextOptions(),
      constCols: Seq[(String, Column)] = Nil): DataFrame = {
    val base = spark.read.options(csvCommon(o))
      .option("mode", "DROPMALFORMED")
      .schema(schema).csv(path)
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
