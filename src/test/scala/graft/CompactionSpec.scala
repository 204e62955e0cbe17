package graft

import graft.core._
import graft.operators._
import graft.sources.ChainGen

/** Segment compaction: many small commits fold into merged segments
  * without changing any observable state, and retraction still works
  * when the reorg range straddles a compacted segment.
  */
class CompactionSpec extends SparkSpec {

  private def reducers = Seq(
    new BlockSummaryReducer,
    new WalletUtxoReducer(ChainGen.Watched),
    new BalanceSnapshotReducer(ChainGen.Watched))

  test("compacted store equals uncompacted store; rollback across merged segment") {
    val blocks = ChainGen.generate(36, seed = 5L)
    val oracle = ChainGen.balanceOracle(blocks)

    // tiny maxSegments → compaction every couple of commits
    val store = new StateStore(tmpDir("compact"), spark, maxSegments = 3)
    val runner = new GraphRunner(spark, store, reducers, batchSize = 3)
    runner.processEvents(blocks.map(RollForward.apply))

    val m = store.manifest
    assert(m.tables("blocks").size <= 3 + 1,
      s"blocks segments not compacted: ${m.tables("blocks").size}")

    val snapSchema = reducers(2).tables.head.schema
    def snaps() = store.read("balance_snapshots", snapSchema)
      .collect().groupBy(_.getLong(3))
      .map { case (slot, rs) => slot -> rs.map(r => r.getString(1) -> r.getLong(4)).toMap }
    assert(snaps().size == oracle.size)
    oracle.foreach { case (slot, bal) => assert(snaps()(slot) == bal) }

    // rollback deep into the merged bulk (block 10 of 36) — the straddle
    // rewrite must filter the compacted segment correctly
    val cut = blocks(9)
    runner.applyRollback(Point(cut.hash, cut.slot), Exclusive)
    assert(snaps().size == 10)
    oracle.take(10).foreach { case (slot, bal) => assert(snaps()(slot) == bal) }

    // and replay back to the tip
    runner.processEvents(blocks.drop(10).map(RollForward.apply))
    oracle.foreach { case (slot, bal) => assert(snaps()(slot) == bal) }
  }

  test("jdbc backend: live-set compaction bounds utxo_created; state and rollback survive") {
    val blocks = ChainGen.generate(60, seed = 7L)
    val oracle = ChainGen.balanceOracle(blocks)
    // compact every 2 commits; tight rollback horizon so the frontier
    // advances and finalized spends become droppable
    spark.conf.set("graft.jdbc.compactEvery", "2")
    try {
      val store = new JdbcStore(tmpDir("jdbc-compact"), spark)
      val runner = new GraphRunner(spark, store, reducers, batchSize = 5,
        maxRollbackSlots = 20L)
      runner.processEvents(blocks.map(RollForward.apply))

      val utxoDefs = reducers(1).tables
      val kept = store.read("utxo_created", utxoDefs.head.schema).count()
      val spentFinal = store.read("utxo_spent", utxoDefs(1).schema)
        .filter(org.apache.spark.sql.functions.col("spentSlot") <=
          blocks.last.slot - 20L).count()
      assert(spentFinal > 0, "chain must actually finalize some spends")
      val totalCreated = blocks.flatMap(_.transactions).flatMap(_.outputs)
        .count(o => ChainGen.Watched.contains(o.address))
      assert(kept < totalCreated,
        s"compaction dropped nothing: kept=$kept of $totalCreated")

      val snapSchema = reducers(2).tables.head.schema
      def snaps() = store.read("balance_snapshots", snapSchema)
        .collect().groupBy(_.getLong(3))
        .map { case (slot, rs) =>
          slot -> rs.map(r => r.getString(1) -> r.getLong(4)).toMap }
      assert(snaps().size == oracle.size)
      oracle.foreach { case (slot, bal) => assert(snaps()(slot) == bal) }

      // shallow rollback (within the horizon) + replay converges
      val cut = blocks(55)
      runner.applyRollback(Point(cut.hash, cut.slot), Exclusive)
      runner.processEvents(blocks.drop(56).map(RollForward.apply))
      oracle.foreach { case (slot, bal) => assert(snaps()(slot) == bal) }
    } finally spark.conf.unset("graft.jdbc.compactEvery")
  }
}
