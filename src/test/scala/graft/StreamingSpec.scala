package graft

import graft.core._
import graft.operators._
import graft.sources.ChainGen
import graft.streaming.{ChainIngest, EventStreams}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming coverage (SURVEY.md §2.8 + the S-layer):
  *  - watermarked windowed aggregation drops late data once the watermark
  *    passes (the engine-surface analogue of MaxRollbackSlots bounding
  *    how far back corrections may reach);
  *  - file-source block ingestion through foreachBatch → GraphRunner
  *    reproduces the batch engine's state, with Spark's checkpoint dir
  *    providing restart-safe offsets (T3's chain cursor).
  */
class StreamingSpec extends SparkSpec {

  test("watermark drops late rows after it advances (append mode)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val counts = EventStreams.windowedCounts(
      mem.toDF().toDF("ts", "event_type"),
      watermark = "10 minutes", windowLen = "10 minutes")
    val q = counts.writeStream.format("memory")
      .queryName("wm_counts").outputMode("append").start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    try {
      mem.addData((t(0), "a"), (t(5), "a"))
      q.processAllAvailable()
      // watermark now 10:05 - 10m = 09:55; window [10:00,10:10) open
      assert(sp.table("wm_counts").count() == 0)
      mem.addData((t(25), "a")) // advances watermark to 10:15, closes window
      q.processAllAvailable()
      mem.addData((t(1), "late")) // before watermark -> dropped
      mem.addData((t(45), "a")) // advances watermark, closes [10:20,10:30)
      q.processAllAvailable()
      val rows = sp.table("wm_counts")
        .select(col("window_start").cast("string"), col("event_type"), col("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(rows.contains(("2024-01-01 10:00:00", "a", 2L)))
      assert(!rows.exists(_._2 == "late"), s"late row leaked: $rows")
    } finally q.stop()
  }

  test("streaming dedup drops duplicates within the watermark; state is bounded by it") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val deduped = EventStreams.dedupedEvents(
      mem.toDF().toDF("ts", "k"), keyCol = "k", watermark = "10 minutes")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_events").outputMode("append").start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    try {
      mem.addData((t(0), "a"), (t(1), "a"), (t(2), "b")) // dup "a" inside window
      q.processAllAvailable()
      mem.addData((t(3), "a")) // still within watermark -> dropped
      q.processAllAvailable()
      mem.addData((t(30), "z")) // advances watermark past 10:13, evicts "a"
      q.processAllAvailable()
      mem.addData((t(31), "a")) // same key AFTER eviction -> re-emitted
      q.processAllAvailable()
      val ks = sp.table("dedup_events").select("k")
        .collect().map(_.getString(0)).toSeq
      assert(ks.count(_ == "a") == 2,
        s"one 'a' per watermark window, got $ks")
      assert(ks.count(_ == "b") == 1)
    } finally q.stop()
  }

  test("streaming block ingestion converges with the batch engine (foreachBatch)") {
    val sp = spark
    import sp.implicits._
    val blocks = ChainGen.generate(20, seed = 42L)
    val oracle = ChainGen.balanceOracle(blocks)
    val blocksDir = tmpDir("stream-blocks")
    val cpDir = tmpDir("stream-cp")
    // two single-file drops → two ordered micro-batches (files are picked
    // up in modification order; one file per drop keeps slot order across
    // batches, as the chain protocol guarantees per connection)
    sp.createDataset(blocks.take(12)).repartition(1)
      .write.mode("append").parquet(blocksDir)
    Thread.sleep(1100)
    sp.createDataset(blocks.drop(12)).repartition(1)
      .write.mode("append").parquet(blocksDir)
    val reducers = Seq(
      new BlockSummaryReducer, new TxIndexReducer,
      new WalletUtxoReducer(ChainGen.Watched),
      new BalanceSnapshotReducer(ChainGen.Watched))
    val store = new StateStore(tmpDir("stream-store"), spark)
    val runner = new GraphRunner(spark, store, reducers, batchSize = 500)
    val q = ChainIngest.start(spark, blocksDir, cpDir, runner,
      trigger = Trigger.AvailableNow(), maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    val snaps = store.read("balance_snapshots", reducers(3).tables.head.schema)
      .collect().groupBy(_.getLong(3))
      .map { case (slot, rs) => slot -> rs.map(r => r.getString(1) -> r.getLong(4)).toMap }
    assert(snaps.size == oracle.size)
    oracle.foreach { case (slot, bal) => assert(snaps(slot) == bal, s"slot $slot") }

    // --- restart with a FRESH stream checkpoint (worst-case replay:
    // every file re-delivered) — the store-checkpoint trim must make the
    // replay a no-op (reference WorkerCrashRecoveryTest semantics) ---
    val q2 = ChainIngest.start(spark, blocksDir, tmpDir("stream-cp2"), runner,
      trigger = Trigger.AvailableNow())
    q2.awaitTermination(120000)
    val after = store.read("blocks", reducers.head.tables.head.schema)
    assert(after.count() == blocks.size, "replayed blocks must be trimmed")
    assert(after.select("hash").distinct().count() == blocks.size)
  }

  test("stream-stream interval join converges with the batch join; state is watermark-bounded") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(sp, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
      .as[(Long, Timestamp)].collect().sortBy(_._2.getTime)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
      .as[(Long, Timestamp)].collect().sortBy(_._2.getTime)
    // batch truth: the same interval predicate as a plain join
    val expected = {
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      c.join(p, expr(
        "c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 30 minutes"))
        .select(col("c_user"), col("c_ts"), col("p_ts"))
        .as[(Long, Timestamp, Timestamp)].collect().toSet
    }
    assert(expected.nonEmpty, "interval join is vacuous on this data")
    val memC = MemoryStream[(Long, Timestamp)]
    val memP = MemoryStream[(Long, Timestamp)]
    val q = graft.streaming.EventStreams.attributedPurchases(
        memC.toDF().toDF("user_id", "ts"), memP.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      // event-time-ordered chunks on both sides: per-side state must
      // carry matches across micro-batch boundaries
      val chunks = 3
      (0 until chunks).foreach { i =>
        memC.addData(clicks.slice(i * clicks.length / chunks,
          (i + 1) * clicks.length / chunks).toIndexedSeq)
        memP.addData(purchases.slice(i * purchases.length / chunks,
          (i + 1) * purchases.length / chunks).toIndexedSeq)
        q.processAllAvailable()
      }
      val got = sp.table("attributed")
        .as[(Long, Timestamp, Timestamp)].collect().toSet
      assert(got == expected,
        s"missing ${(expected -- got).size}, extra ${(got -- expected).size}")
      // the join kept STATE (not everything matched within one batch)
      val stateRows = Option(q.lastProgress)
        .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
      assert(stateRows.exists(_ > 0), s"join state missing: $stateRows")
    } finally q.stop()
  }

  test("flatMapGroupsWithState funnel converges with batch q45 across micro-batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val dir = "/root/testdata/sf0.001"
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    // real events, delivered event-time-ordered in three chunks so per-user
    // state must survive micro-batch boundaries
    val all = graft.Tables.events(sp, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[graft.streaming.FunnelEvent]
      .collect().sortBy(e => micros(e.ts))
    val mem = MemoryStream[graft.streaming.FunnelEvent]
    val q = EventStreams.funnelStages(mem.toDS()).writeStream
      .format("memory").queryName("funnel_stages")
      .outputMode("append").start()
    try {
      all.grouped((all.length + 2) / 3).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val fmt = "yyyy-MM-dd HH:mm:ss"
      val got = sp.table("funnel_stages")
        .select(col("user_id"), col("stage"),
          date_format(col("ts"), fmt).as("t"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (u, rs) =>
          u -> rs.map(r => r.getInt(1) -> r.getString(2)).toMap
        }
      val want = SparkEntry.queries("q45_funnel")(sp, dir).collect()
        .map { r =>
          r.getLong(0) -> (r.getInt(1),
            Map(1 -> r.getString(2), 2 -> r.getString(3),
              3 -> r.getString(4)).filter(_._2 != null))
        }.toMap
      assert(got.keySet == want.keySet,
        "streaming must emit stages for exactly the users batch q45 reports")
      want.foreach { case (u, (stage, times)) =>
        assert(got(u).size == stage, s"user $u: ${got(u)} vs stage $stage")
        assert(got(u) == times, s"user $u: ${got(u)} vs $times")
      }
      // each transition emitted exactly once: no user exceeds 3 rows
      assert(got.values.forall(_.size <= 3))
    } finally q.stop()
  }
}
