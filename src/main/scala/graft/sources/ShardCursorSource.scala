package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The endpoint a [[ShardCursorSource]] stream tails: a fixed set of
  * shards, each an append-only record sequence addressed by a MONOTONE
  * cursor — the shape of the reference's DataHub/OTS stream readers
  * (`datahubreader/.../DatahubReader.java`: per-shard cursor loop;
  * `otsstreamreader/.../OTSStreamReaderMasterProxy.java:78-107`: shard
  * list + checkpointed positions). Implementations must be reachable on
  * executor classpaths and registered under a name ([[ShardFeeds]]);
  * `read` must be repeatable for any committed cursor range (the source
  * replays ranges on recovery — same contract as a DataHub cursor). */
trait ShardFeed extends Serializable {
  def schema: StructType
  def shards: Seq[Int]
  /** Exclusive end cursor of `shard` right now (grows monotonically). */
  def endCursor(shard: Int): Long
  /** Records of `shard` in cursor range [from, until). */
  def read(shard: Int, from: Long, until: Long): Iterator[Row]
}

/** Name → feed registry (string options are all a DSv2 source can carry,
  * so the DRIVER resolves the feed by name; the resolved instance is then
  * serialized into each input partition, so executors never consult this
  * per-JVM map — see [[ShardCursorSource]]). */
object ShardFeeds {
  private val feeds = new java.util.concurrent.ConcurrentHashMap[String, ShardFeed]()
  def register(name: String, feed: ShardFeed): Unit = feeds.put(name, feed)
  def get(name: String): ShardFeed = Option(feeds.get(name)).getOrElse(
    throw new IllegalArgumentException(
      s"no ShardFeed registered under '$name' (known: ${feeds.keySet().asScala.mkString(", ")})"))
}

/** Executable shard-cursor streaming source (reference S11 transport):
  * one Spark input partition per shard per trigger, `{shard -> cursor}`
  * checkpointed as the stream offset, so a restart resumes each shard
  * exactly where it left off and the downstream idempotent merge keeps
  * the pipeline exactly-once end to end.
  *
  * {{{
  * ShardFeeds.register("myfeed", feed)
  * spark.readStream.format(classOf[ShardCursorSource].getName)
  *   .option("feed", "myfeed").load()
  * }}}
  */
class ShardCursorSource extends TableProvider {
  private def feedName(options: CaseInsensitiveStringMap): String =
    Option(options.get("feed")).getOrElse(
      throw new IllegalArgumentException("option 'feed' is required"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShardFeeds.get(feedName(options)).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ShardCursorSource.FeedTable(properties.get("feed"), schema)
}

object ShardCursorSource {
  private implicit val fmts: org.json4s.DefaultFormats = org.json4s.DefaultFormats

  /** `{shard -> next cursor}` — the stream's replay position. */
  case class ShardOffsets(cursors: Map[String, Long]) extends Offset {
    override def json: String = org.json4s.jackson.Serialization.write(cursors)
    def cursor(shard: Int): Long = cursors.getOrElse(shard.toString, 0L)
  }

  private class FeedTable(feedName: String, tableSchema: StructType)
      extends Table with SupportsRead {
    override def name(): String = s"shard-feed-$feedName"
    override def schema(): StructType = tableSchema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder with Scan {
        override def build(): Scan = this
        override def readSchema(): StructType = tableSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new FeedStream(feedName, tableSchema)
      }
  }

  private class FeedStream(feedName: String, schema: StructType)
      extends MicroBatchStream
      with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
    private def feed = ShardFeeds.get(feedName)
    private def currentEnd: ShardOffsets =
      ShardOffsets(feed.shards.map(s => s.toString -> feed.endCursor(s)).toMap)
    /** Trigger.AvailableNow: pin the drain bound at query start so the
      * run terminates even while the feed keeps growing. */
    private var availableNowBound: Option[ShardOffsets] = None
    override def prepareForTriggerAvailableNow(): Unit =
      availableNowBound = Some(currentEnd)
    override def getDefaultReadLimit:
        org.apache.spark.sql.connector.read.streaming.ReadLimit =
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
    override def latestOffset(start: Offset,
        limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
      availableNowBound.getOrElse(currentEnd)
    override def reportLatestOffset(): Offset = currentEnd
    override def initialOffset(): Offset =
      ShardOffsets(feed.shards.map(s => s.toString -> 0L).toMap)
    override def latestOffset(): Offset = throw new UnsupportedOperationException(
      "admission-control variant latestOffset(start, limit) is used")
    override def deserializeOffset(json: String): Offset =
      ShardOffsets(org.json4s.jackson.JsonMethods.parse(json)
        .extract[Map[String, Long]])
    override def commit(end: Offset): Unit = () // positions live in the checkpoint
    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val s = start.asInstanceOf[ShardOffsets]
      val e = end.asInstanceOf[ShardOffsets]
      // the feed INSTANCE rides the partition (ShardFeed is Serializable):
      // the ShardFeeds registry is a per-JVM map populated on the driver,
      // so resolving by name on an executor would throw on a real cluster
      // — local-mode-only code masquerading as distributed
      val f = feed
      f.shards.flatMap { sh =>
        val (from, until) = (s.cursor(sh), e.cursor(sh))
        if (until > from) Some(ShardPartition(f, sh, from, until): InputPartition)
        else None
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new ShardReaderFactory(schema)
    override def stop(): Unit = ()
  }

  private case class ShardPartition(feed: ShardFeed, shard: Int,
      from: Long, until: Long) extends InputPartition

  private class ShardReaderFactory(schema: StructType)
      extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val sp = p.asInstanceOf[ShardPartition]
      val rows = sp.feed.read(sp.shard, sp.from, sp.until)
      val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
      new PartitionReader[InternalRow] {
        private var cur: InternalRow = _
        override def next(): Boolean =
          if (rows.hasNext) { cur = toCatalyst(rows.next()).asInstanceOf[InternalRow]; true }
          else false
        override def get(): InternalRow = cur
        override def close(): Unit = ()
      }
    }
  }
}
