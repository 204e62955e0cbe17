package graft

import graft.core._
import graft.operators._
import graft.sources.ChainGen
import org.apache.spark.sql.DataFrame

/** T12 fail-fast semantics (reference `ReducerGraphProcessor.cs:114-119`:
  * a reducer fault discards the WHOLE open batch, no partial data) and
  * T13 single-writer exclusion.
  */
class FailFastSpec extends SparkSpec {

  /** Fails on any block at or past `failSlot` — the sibling-crash shape
    * of `ForkBranchAtomicityTest`.
    */
  private class FaultyReducer(failSlot: Long) extends ChainReducer {
    val name = "faulty"
    override val dependsOn = Some("block_summary")
    val tables = Seq(TableDef("faulty_rows",
      new BlockSummaryReducer().tables.head.schema))
    def rollForward(blocks: DataFrame, ctx: BatchContext): Map[String, DataFrame] = {
      val mx = blocks.agg(org.apache.spark.sql.functions.max("slot"))
        .head().getLong(0)
      if (mx >= failSlot) throw new RuntimeException(s"boom at $mx")
      Map("faulty_rows" -> blocks.select("hash", "height", "slot"))
    }
  }

  test("a reducer fault discards the whole open batch; prior commits survive (T12)") {
    val blocks = ChainGen.generate(20, seed = 11L)
    val failSlot = blocks(10).slot
    val store = new StateStore(tmpDir("failfast"), spark)
    val runner = new GraphRunner(spark, store,
      Seq(new BlockSummaryReducer, new FaultyReducer(failSlot)), batchSize = 5)
    val err = intercept[RuntimeException] {
      runner.processEvents(blocks.map(RollForward.apply))
    }
    assert(err.getMessage.startsWith("boom"))
    val m = store.manifest
    // batches before the faulting one are committed; the faulting batch
    // left nothing — both tables stop at the same pre-fault boundary
    val blockSchema = new BlockSummaryReducer().tables.head.schema
    val committedBlocks = store.read("blocks", blockSchema)
    val committedFaulty = store.read("faulty_rows", blockSchema)
    assert(committedBlocks.count() == committedFaulty.count(),
      "parent rows from the faulted batch must not be committed")
    val maxSlot = committedBlocks.agg(
      org.apache.spark.sql.functions.max("slot")).head().getLong(0)
    assert(maxSlot < failSlot)
    // checkpoints agree with the data (atomicity)
    assert(m.checkpoints.values.forall(w =>
      CheckpointWindow.latest(w).forall(_.slot == maxSlot)))
    // restart-style resume replays cleanly with a fixed reducer
    val runner2 = new GraphRunner(spark, store,
      Seq(new BlockSummaryReducer, new FaultyReducer(Long.MaxValue)),
      batchSize = 5)
    runner2.resume(blocks.map(RollForward.apply))
    assert(store.read("blocks", blockSchema).count() == blocks.size)
    assert(store.read("faulty_rows", blockSchema).count() == blocks.size)
  }

  test("second instance cannot acquire the store lock (T13)") {
    val root = tmpDir("lock")
    val l1 = new SingleInstanceLock(root)
    assert(l1.tryAcquire() && l1.isHeld)
    val l2 = new SingleInstanceLock(root)
    assert(!l2.tryAcquire(), "second instance must park")
    l1.close()
    val l3 = new SingleInstanceLock(root)
    assert(l3.tryAcquire(), "lock must be acquirable after release")
    l3.close(); l2.close()
  }
}
