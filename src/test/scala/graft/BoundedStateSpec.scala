package graft

import graft.core._
import graft.operators._
import graft.sources.ChainGen
import graft.streaming.ChainIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-2 scale fixes pinned (VERDICT r1 "What's wrong" #2/#3 +
  * ADVICE items):
  *  - live-UTxO compaction: finalized spends (behind the rollback
  *    frontier) are dropped from `utxo_created` at compaction, so spend
  *    matching reads O(live set) — while balances stay oracle-exact and
  *    rollback within the guard still works.
  *  - a registered reducer with no stored checkpoint forces a rebuild
  *    (not a silent skip of history).
  *  - ChainIngest refuses a second concurrent instance on one store
  *    root (T13 wired into the production path).
  */
class BoundedStateSpec extends SparkSpec {

  private def reducers = Seq(
    new BlockSummaryReducer,
    new TxIndexReducer,
    new WalletUtxoReducer(ChainGen.Watched),
    new BalanceSnapshotReducer(ChainGen.Watched))

  private def snapshotState(store: StateStore): Map[Long, Map[String, Long]] = {
    store.read("balance_snapshots", reducers(3).tables.head.schema)
      .collect().groupBy(_.getLong(3)).map { case (slot, rows) =>
        slot -> rows.map(r => r.getString(1) -> r.getLong(4)).toMap
      }
  }

  private def assertOracle(store: StateStore,
      oracle: Seq[(Long, Map[String, Long])]): Unit = {
    val got = snapshotState(store)
    assert(got.size == oracle.size,
      s"snapshot count ${got.size} != oracle ${oracle.size}")
    oracle.foreach { case (slot, bal) =>
      assert(got(slot) == bal, s"slot $slot: got ${got.get(slot)}, oracle $bal")
    }
  }

  test("compaction drops finalized spends; balances exact; shallow rollback still works") {
    val blocks = ChainGen.generate(80, seed = 11L)
    val oracle = ChainGen.balanceOracle(blocks)
    val store = new StateStore(tmpDir("bounded"), spark, maxSegments = 3)
    val runner = new GraphRunner(spark, store, reducers, batchSize = 5,
      maxRollbackSlots = 30)
    runner.processEvents(blocks.map(RollForward.apply))
    assertOracle(store, oracle)

    // the created table is now smaller than full history: finalized
    // spent pairs were dropped at compaction (live + rollback-window
    // churn remain)
    val utxoDefs = reducers(2).tables
    val watchedAddrs = ChainGen.Watched.keySet
    val fullHistory = blocks.flatMap(_.transactions)
      .flatMap(_.outputs).count(o => watchedAddrs(o.address))
    val storeCount = store.read("utxo_created", utxoDefs(0).schema).count()
    assert(storeCount < fullHistory,
      s"expected finalized spends dropped: $storeCount vs $fullHistory")

    // unspent view still matches the oracle's live set at the tip
    val unspent = WalletUtxoReducer.unspentView(
        store.read("utxo_created", utxoDefs(0).schema),
        store.read("utxo_spent", utxoDefs(1).schema))
      .groupBy(col("addressName")).agg(sum(col("amount")).as("bal"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unspent == oracle.last._2.filter(_._2 > 0))

    // shallow rollback (within the 30-slot guard) + replay reconverges
    val cut = blocks(74)
    runner.applyRollback(Point(cut.hash, cut.slot), Exclusive)
    assertOracle(store, oracle.take(75))
    runner.processEvents(blocks.drop(75).map(RollForward.apply))
    assertOracle(store, oracle)
  }

  test("resume with a checkpoint-less registered ROOT rebuilds from genesis") {
    val blocks = ChainGen.generate(12, seed = 3L)
    val root = tmpDir("rebuild")
    val store1 = new StateStore(root, spark)
    new GraphRunner(spark, store1, Seq(new BlockSummaryReducer), batchSize = 5)
      .processEvents(blocks.map(RollForward.apply))

    // second run registers a NEW root reducer with no checkpoint: resume
    // must replay history for it, without duplicating the old one
    val store2 = new StateStore(root, spark)
    val rs = Seq(new BlockSummaryReducer,
      new WalletUtxoReducer(ChainGen.Watched))
    val runner2 = new GraphRunner(spark, store2, rs, batchSize = 5)
    runner2.resume(blocks.map(RollForward.apply))
    assert(store2.read("blocks", rs.head.tables.head.schema).count()
      == blocks.size)
    val watchedAddrs = ChainGen.Watched.keySet
    val expectedCreated = blocks.flatMap(_.transactions)
      .flatMap(_.outputs).count(o => watchedAddrs(o.address))
    assert(store2.read("utxo_created", rs(1).tables.head.schema).count()
      == expectedCreated)
  }

  test("fresh DEPENDENT adopts parent position; configured starts filter delivery (T9)") {
    val blocks = ChainGen.generate(12, seed = 3L)
    val root = tmpDir("t9")
    val store1 = new StateStore(root, spark)
    new GraphRunner(spark, store1, Seq(new BlockSummaryReducer), batchSize = 5)
      .processEvents(blocks.map(RollForward.apply))
    val parentTip = blocks.last.slot

    // fresh dependent (tx_index dependsOn block_summary) adopts the
    // parent's latest point: no history replayed for it, no duplicates
    // for the parent (reference StartPoints Case 1)
    val store2 = new StateStore(root, spark)
    val rs = Seq(new BlockSummaryReducer, new TxIndexReducer)
    val runner2 = new GraphRunner(spark, store2, rs, batchSize = 5)
    val diags = runner2.reconcileStartup()
    assert(diags.exists {
      case AdjustedStart("tx_index", "block_summary", to) =>
        to.slot == parentTip
      case _ => false
    }, s"expected AdjustedStart, got $diags")
    assert(runner2.startPoint("tx_index").slot == parentTip)
    runner2.processEvents(
      blocks.filter(_.slot > runner2.latestCheckpointSlot)
        .map(RollForward.apply))
    assert(store2.read("blocks", rs.head.tables.head.schema).count()
      == blocks.size, "parent must not duplicate")
    assert(store2.read("transactions", rs(1).tables.head.schema).count()
      == 0L, "fresh dependent starts at parent position, not genesis")

    // new blocks past the adopted start ARE delivered to the dependent
    val more = ChainGen.generate(4, seed = 9L, startSlot = parentTip + 10)
    runner2.processEvents(more.map(RollForward.apply))
    assert(store2.read("transactions", rs(1).tables.head.schema).count()
      == more.map(_.transactions.size).sum)

    // configured start point filters delivery for a fresh run
    val store3 = new StateStore(tmpDir("t9c"), spark)
    val cut = blocks(5).slot
    val r3 = Seq(new BlockSummaryReducer)
    val runner3 = new GraphRunner(spark, store3, r3, batchSize = 5,
      configuredStarts = Map("block_summary" -> Point(blocks(5).hash, cut)))
    runner3.processEvents(blocks.map(RollForward.apply))
    assert(store3.read("blocks", r3.head.tables.head.schema).count()
      == blocks.count(_.slot > cut))
  }

  test("graph validation rejects duplicate reducer and table names, reports cycles") {
    val store = new StateStore(tmpDir("valid"), spark)
    class Named(val name: String, dep: Option[String]) extends ChainReducer {
      override def dependsOn: Option[String] = dep
      val tables = Seq(TableDef(s"t_$name",
        new BlockSummaryReducer().tables.head.schema))
      def rollForward(b: org.apache.spark.sql.DataFrame, c: BatchContext) =
        Map.empty
    }
    val dup = intercept[IllegalArgumentException] {
      new GraphRunner(spark, store, Seq(new Named("a", None), new Named("a", None)))
    }
    assert(dup.getMessage.contains("duplicate reducer names"))
    val cyc = intercept[IllegalArgumentException] {
      new GraphRunner(spark, store, Seq(
        new Named("a", Some("b")), new Named("b", Some("c")),
        new Named("c", Some("a"))))
    }
    assert(cyc.getMessage.contains("cycle"))
    class TableClash(val name: String) extends ChainReducer {
      val tables = Seq(TableDef("shared_t",
        new BlockSummaryReducer().tables.head.schema))
      def rollForward(b: org.apache.spark.sql.DataFrame, c: BatchContext) =
        Map.empty
    }
    val tdup = intercept[IllegalArgumentException] {
      new GraphRunner(spark, store,
        Seq(new TableClash("x"), new TableClash("y")))
    }
    assert(tdup.getMessage.contains("duplicate table names"))
  }

  test("two-phase segment GC: disk = manifest refs + one pending generation") {
    val blocks = ChainGen.generate(40, seed = 4L)
    val root = tmpDir("gc")
    val store = new StateStore(root, spark, maxSegments = 3)
    val runner = new GraphRunner(spark, store, reducers, batchSize = 4,
      maxRollbackSlots = 30)
    runner.processEvents(blocks.map(RollForward.apply))
    // a rollback leaves dropped + rewritten-straddler segments behind too
    val cut = blocks(35)
    runner.applyRollback(Point(cut.hash, cut.slot), Exclusive)

    def onDiskCounts: Map[String, Int] =
      store.manifest.tables.keys.map { table =>
        val dir = java.nio.file.Paths.get(root, "tables", table)
        table -> java.nio.file.Files.list(dir).toList.size
      }.toMap
    // phase 1: superseded dirs still on disk, all recorded in pendingGc
    val m = store.manifest
    m.tables.foreach { case (table, segs) =>
      val pendingForTable = m.pendingGc.count(_.contains(s"/$table/"))
      assert(onDiskCounts(table) == segs.size + pendingForTable,
        s"$table: disk=${onDiskCounts(table)} manifest=${segs.size} " +
          s"pending=$pendingForTable")
    }
    // phase 2: the next swap reaps the previous generation
    runner.processEvents(blocks.drop(36).map(RollForward.apply))
    val m2 = store.manifest
    m2.tables.foreach { case (table, segs) =>
      val pendingForTable = m2.pendingGc.count(_.contains(s"/$table/"))
      assert(onDiskCounts(table) == segs.size + pendingForTable,
        s"$table after reap: disk=${onDiskCounts(table)} " +
          s"manifest=${segs.size} pending=$pendingForTable")
    }
  }

  test("age trigger flushes a trickling open batch (T1 trigger b)") {
    val blocks = ChainGen.generate(6, seed = 6L)
    val store = new StateStore(tmpDir("age"), spark)
    // fake clock advancing 600 ms per call: every second event exceeds
    // the 1000 ms age bound, so commits happen in pairs, not one big
    // drain flush (reference MaxDelayMs semantics)
    var now = 0L
    val runner = new GraphRunner(spark, store,
      Seq(new BlockSummaryReducer), batchSize = 100,
      maxDelayMs = 1000L, clock = () => { now += 600L; now })
    runner.processEvents(blocks.map(RollForward.apply))
    assert(store.batchId >= 2L,
      s"age trigger must commit multiple small batches, got ${store.batchId}")
    assert(store.read("blocks",
      new BlockSummaryReducer().tables.head.schema).count() == blocks.size)
  }

  test("ChainIngest refuses a second concurrent instance on one store root (T13)") {
    val sp = spark
    import sp.implicits._
    val blocksDir = tmpDir("lock-blocks")
    // non-empty dir so the long-running stream has a valid source
    sp.createDataset(ChainGen.generate(3, seed = 5L)).repartition(1)
      .write.mode("append").parquet(blocksDir)
    val root = tmpDir("lock-store")
    def mkRunner() = new GraphRunner(spark, new StateStore(root, spark),
      Seq(new BlockSummaryReducer), batchSize = 5)
    val q = ChainIngest.start(spark, blocksDir, tmpDir("lock-cp1"), mkRunner(),
      trigger = Trigger.ProcessingTime("1 second"))
    try {
      intercept[IllegalStateException] {
        ChainIngest.start(spark, blocksDir, tmpDir("lock-cp2"), mkRunner(),
          lockWaitMs = 0L)
      }
    } finally q.stop()
    // after termination the lock is released (async listener) — a new
    // instance acquires within the wait window
    val q3 = ChainIngest.start(spark, blocksDir, tmpDir("lock-cp3"), mkRunner())
    q3.awaitTermination(120000)
  }

  test("a far-behind configured ROOT does not empty veteran windows: no genesis replay over retained rows") {
    // r08 review: the min-across-graph resume used the "resume"
    // sentinel, which is never persisted — when the newcomer's
    // configured start sat BELOW the veterans' ~10-slot window depth,
    // the rollback emptied those windows, latestCheckpointSlot fell
    // back to -1, and resume replayed the retained prefix from genesis
    // ON TOP of it. The fix rolls back to the REAL point defining the
    // safe slot, which the Exclusive keep-the-survivor rule then
    // anchors in every window.
    val blocks = ChainGen.generate(40, seed = 9L)
    val root = tmpDir("farstart")
    val store1 = new StateStore(root, spark)
    new GraphRunner(spark, store1, Seq(new BlockSummaryReducer), batchSize = 5)
      .processEvents(blocks.map(RollForward.apply))

    val cutIdx = 10 // far below the veteran's window floor (newest ~10 of 40)
    val cut = blocks(cutIdx)
    val store2 = new StateStore(root, spark)
    val rs = Seq(new BlockSummaryReducer,
      new WalletUtxoReducer(ChainGen.Watched))
    val runner2 = new GraphRunner(spark, store2, rs, batchSize = 5,
      configuredStarts = Map("wallet_utxo" -> Point(cut.hash, cut.slot)))
    runner2.resume(blocks.map(RollForward.apply))
    // veteran prefix NOT duplicated: exactly one row per block
    assert(store2.read("blocks", rs.head.tables.head.schema).count()
      == blocks.size, "veteran rows duplicated by a genesis replay")
    // and the safe point that anchored the windows is a REAL chain point
    assert(store2.checkpoints.values.flatten
      .forall(p => p.hash != "resume" && p.hash != "rewind"))
  }

  test("a deep operator rewind persists NO fake-hash point; the store rebuilds cleanly") {
    // r08 review: Point("rewind", slot) was not on the sentinel list,
    // so a deep rewind persisted a fake-hash point that the next
    // chain-sync would offer as its only intersection candidate — and
    // no server can ever match it
    val blocks = ChainGen.generate(20, seed = 11L)
    val root = tmpDir("rewindsent")
    val store = new StateStore(root, spark)
    val r1 = new GraphRunner(spark, store,
      Seq(new BlockSummaryReducer), batchSize = 5)
    r1.processEvents(blocks.map(RollForward.apply))
    r1.forceRollback(Point("rewind", blocks(2).slot), Exclusive)
    assert(store.checkpoints.values.flatten.forall(_.hash != "rewind"),
      "the rewind sentinel must never be persisted")
    // restart converges: empty windows + retained data -> clean rebuild
    val store2 = new StateStore(root, spark)
    val r2 = new GraphRunner(spark, store2,
      Seq(new BlockSummaryReducer), batchSize = 5)
    r2.resume(blocks.map(RollForward.apply))
    assert(store2.read("blocks",
      new BlockSummaryReducer().tables.head.schema).count() == blocks.size)
  }

  test("a parent configured AHEAD of a checkpointed dependent fails loudly, not silently losing rows") {
    // r08 review: flushImpl filters each reducer by its OWN start, so
    // a parent skipping blocks its checkpointed dependent still
    // processes would drop the joined rows permanently
    val blocks = ChainGen.generate(12, seed = 13L)
    val root = tmpDir("parentahead")
    val store1 = new StateStore(root, spark)
    val both = Seq(new BlockSummaryReducer, new TxIndexReducer)
    new GraphRunner(spark, store1, both, batchSize = 5)
      .processEvents(blocks.take(6).map(RollForward.apply))

    val store2 = new StateStore(root, spark)
    val ahead = blocks.last
    val runner2 = new GraphRunner(spark, store2,
      Seq(new BlockSummaryReducer, new TxIndexReducer), batchSize = 5,
      configuredStarts =
        Map("block_summary" -> Point(ahead.hash, ahead.slot)))
    val ex = intercept[IllegalArgumentException](runner2.reconcileStartup())
    assert(ex.getMessage.contains("AHEAD"), ex.getMessage)
  }
}
