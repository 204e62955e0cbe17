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
}
