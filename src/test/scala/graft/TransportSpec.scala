package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import graft.sources.FileIo
import graft.sources.FileIo.TextOptions

/** Evidence that the engine's file I/O is transport-agnostic: every call
  * resolves the filesystem from the PATH SCHEME via Hadoop's
  * `fs.<scheme>.impl` registry, so FTP/OSS/HDFS-style transports (the
  * reference's `txtfilereader`/`osswriter` surface) need only a registered
  * `FileSystem` — no engine changes. `MemFs` stands in for such a
  * transport under `graftmem://`; the spec drives enumeration, a schema'd
  * Spark scan, and a full Spark write (output-committer rename protocol
  * included) through it.
  */
class TransportSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def seed(): Unit = {
    MemFs.clear()
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftmem.impl", classOf[MemFs].getName)
    val fs = new Path("graftmem://store/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for ((n, body) <- Seq(
        "a1.csv" -> "1,x\n2,y\n", "a2.csv" -> "3,z\n", "b.txt" -> "nope")) {
      val out = fs.create(new Path(s"graftmem://store/in/$n"))
      out.write(body.getBytes("UTF-8")); out.close()
    }
  }

  test("enumerate globs a non-local scheme through fs.<scheme>.impl") {
    seed()
    assert(FileIo.enumerate(spark, "graftmem://store/in/a*.csv")
      .map(_.split('/').last) === Seq("a1.csv", "a2.csv"))
    // directory match recurses, as on file://
    assert(FileIo.enumerate(spark, "graftmem://store/in")
      .map(_.split('/').last) === Seq("a1.csv", "a2.csv", "b.txt"))
    intercept[IllegalArgumentException] {
      FileIo.enumerate(spark, "graftmem://store/in/z*.none")
    }
  }

  test("Spark scan reads a non-local scheme (schema'd CSV over graftmem://)") {
    seed()
    val got = FileIo.readCsv(spark, "graftmem://store/in/a*.csv", schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "x"), (2L, "y"), (3L, "z")))
  }

  test("Spark write commits to a non-local scheme (committer rename protocol)") {
    seed()
    val df = Seq((10L, "p"), (11L, "q"), (12L, "r")).toDF("id", "v")
    FileIo.writeCsv(df.repartition(2), "graftmem://store/out",
      TextOptions(), "truncate")
    // _SUCCESS + data files landed in the in-memory store, not on disk
    val names = FileIo.enumerate(spark, "graftmem://store/out")
      .map(_.split('/').last)
    assert(names.contains("_SUCCESS"))
    assert(names.exists(_.startsWith("part-")))
    val back = FileIo.readCsv(spark, "graftmem://store/out", schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back === Set((10L, "p"), (11L, "q"), (12L, "r")))
    // nonConflict honors the scheme's existence check
    intercept[Exception] {
      FileIo.writeCsv(df, "graftmem://store/out", TextOptions(), "nonConflict")
    }
  }

  test("exclusive create is atomic: racing creators see exactly one winner") {
    seed()
    val fs = new Path("graftmem://store/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path("graftmem://store/race/v1.json")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val losses = new java.util.concurrent.atomic.AtomicInteger(0)
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        barrier.await()
        try {
          val out = fs.create(target, /* overwrite = */ false)
          out.write(s"writer-$i".getBytes("UTF-8")); out.close()
          wins.incrementAndGet()
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
            losses.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() === 1)
    assert(losses.get() === 7)
  }
}
