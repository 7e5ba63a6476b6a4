package graft

import java.sql.Timestamp

import graft.model.Model.ChangeEvent
import graft.plans.{CommitStore, HadoopCommitStore, Icelite, LocalLinkCommitStore}
import graft.streaming.Ingest

/** The pluggable atomic-commit seam (round-4 verdict item 1): all three
  * shipped stores — local hard-link, Hadoop exclusive-create, and the
  * conditional-put CAS exemplar — uphold the exclusive-create contract,
  * the deterministic commit race passes under each, and the class-name
  * extension point loads a user store. */
class CommitStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)
  private def ev(op: String, conv: String, turn: Int, text: String,
      eventSec: Long, seq: Long): ChangeEvent =
    ChangeEvent(op, conv, turn, if (op == "D") null else "user",
      if (op == "D") null else text, null,
      if (op == "D") null else ts(eventSec), ts(eventSec), seq)
  private def batchOf(events: ChangeEvent*) = spark.createDataset(events).toDF()

  private def contract(store: CommitStore): Unit = {
    val dir = java.nio.file.Paths.get(tmpDir("cs"))
    val t = dir.resolve("v01.json").toUri
    store.publishAtomic(t, "first".getBytes)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t))) === "first")
    // second create conflicts AND the winner's bytes are untouched
    intercept[Icelite.CommitConflictException] {
      store.publishAtomic(t, "second".getBytes)
    }
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t))) === "first")
    // no temp/partial files left behind (Hadoop's .crc sidecars are fine —
    // hidden, and nothing in icelite globs them)
    val ls = java.nio.file.Files.list(dir)
    val leftovers =
      try {
        val it = ls.iterator(); var l = List.empty[String]
        while (it.hasNext) l ::= it.next().getFileName.toString
        l.filter(n => n.startsWith(".tmp") || n.startsWith(".v01.json.tmp"))
      } finally ls.close()
    assert(leftovers.isEmpty, s"partial files left: $leftovers")
  }

  test("local link store upholds the exclusive-create contract") {
    contract(LocalLinkCommitStore)
  }

  test("hadoop store upholds the exclusive-create contract") {
    contract(new HadoopCommitStore())
  }

  test("CAS store (exclusive-create backend) upholds the contract") {
    contract(new graft.plans.CasCommitStore())
  }

  test("CAS store over the in-memory object store: concurrent publishers, one winner") {
    // the conditional-put fake is strictly all-or-nothing — this exercises
    // the exact API shape an S3/GCS/OSS adapter would provide
    val backend = new graft.plans.InMemoryCasBackend()
    val store = new graft.plans.CasCommitStore(backend)
    val target = new java.net.URI("s3-fake://bucket/t/v0000000001.json")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
    val winners = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        barrier.await()
        try {
          store.publishAtomic(target, s"writer-$i".getBytes("UTF-8"))
          wins.incrementAndGet(); winners.add(i)
        } catch {
          case _: Icelite.CommitConflictException => conflicts.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() === 1)
    assert(conflicts.get() === 7)
    val got = new String(backend.objects.get(target.toString), "UTF-8")
    assert(got === s"writer-${winners.iterator().next()}")
  }

  test("hadoop store over a remote scheme: concurrent publishers, one winner") {
    // on file:// the Hadoop store's create(overwrite=false) is
    // check-then-create (documented); graftmem:// reserves the key
    // atomically, so THIS backend genuinely exercises the concurrent
    // half of the contract the remote deployment relies on
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftmem.impl", classOf[MemFs].getName)
    MemFs.clear()
    val store = new HadoopCommitStore(spark.sparkContext.hadoopConfiguration)
    val target = new java.net.URI("graftmem://store/cs/v0000000001.json")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val winners = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        barrier.await()
        try {
          store.publishAtomic(target, s"writer-$i".getBytes("UTF-8"))
          wins.incrementAndGet(); winners.add(i)
        } catch {
          case _: Icelite.CommitConflictException => conflicts.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() === 1)
    assert(conflicts.get() === 7)
    val got = new String(MemFs.files.get("/cs/v0000000001.json"), "UTF-8")
    val w = winners.iterator().next()
    assert(got === s"writer-$w") // the winner's bytes, complete and intact
  }

  test("scheme-based default: local paths take the link store") {
    assert(CommitStore.forRoot("/tmp/x") eq LocalLinkCommitStore)
    assert(CommitStore.forRoot("file:///tmp/x") eq LocalLinkCommitStore)
    assert(CommitStore.forRoot("hdfs://nn:8020/w/t").isInstanceOf[HadoopCommitStore])
    // a local path that is not a valid URI must still resolve (not throw)
    assert(CommitStore.forRoot("/tmp/with space/t") eq LocalLinkCommitStore)
  }

  test("class-name extension point loads and uses a custom store") {
    System.setProperty(CommitStore.SelectProp, classOf[CountingStore].getName)
    try {
      val store = CommitStore.forRoot("/tmp/whatever")
      assert(store.isInstanceOf[CountingStore])
      val before = CountingStore.publishes.get()
      // a real table create commits v0 through the selected store
      val root = s"${tmpDir("csx")}/t"
      Icelite.create(spark, root,
        batchOf(ev("I", "c1", 0, "a", 1, 1)).drop("op", "event_ts", "seq").schema, 2)
      assert(CountingStore.publishes.get() > before)
      assert(Icelite.exists(root))
    } finally System.clearProperty(CommitStore.SelectProp)
  }

  test("commit race: merge rebases over concurrent compaction under ALL THREE stores") {
    for (storeSel <- Seq("local", "hadoop", classOf[graft.plans.CasCommitStore].getName)) {
      System.setProperty(CommitStore.SelectProp, storeSel)
      try {
        val root = tmpDir(s"csrace-${storeSel.replace('.', '_')}")
        val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2,
          opts = Icelite.Options(compactThreshold = 100))
        Ingest.replay(spark, cfg, Seq(batchOf(
          ev("I", "c1", 0, "a", 1, 1), ev("I", "c2", 0, "b", 1, 2))))
        val t = Icelite.load(spark, cfg.tablePath)
        val maint = Icelite.load(spark, cfg.tablePath)
        val base = t.snapshot().snapshotId
        var fired = false
        t.beforeCommit = () => if (!fired) { fired = true; maint.compactAll() }
        val stats = t.merge(batchOf(ev("U", "c1", 0, "a2", 5, 10)), 1L, "w", cfg.opts)
        assert(fired, s"store=$storeSel")
        assert(!stats.skipped && stats.snapshotId === base + 2, s"store=$storeSel")
        val got = t.read().select("conv_id", "turn_idx", "text")
          .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
        assert(got === Set(("c1", 0, "a2"), ("c2", 0, "b")), s"store=$storeSel")
        assert(t.snapshotAt(base + 1).summary.get("maintenance").contains("compact"))
      } finally System.clearProperty(CommitStore.SelectProp)
    }
  }
}

/** Test double for the extension point — counts publishes, delegates to
  * the local store so the table stays real. Needs the public no-arg
  * constructor the seam documents. */
class CountingStore extends CommitStore {
  override def publishAtomic(target: java.net.URI, bytes: Array[Byte]): Unit = {
    CountingStore.publishes.incrementAndGet()
    LocalLinkCommitStore.publishAtomic(target, bytes)
  }
}
object CountingStore {
  val publishes = new java.util.concurrent.atomic.AtomicLong()
}
