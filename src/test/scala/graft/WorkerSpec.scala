package graft

import graft.core._
import graft.operators._
import graft.sources.ChainGen
import graft.streaming.Worker
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Multi-root worker semantics (reference `CardanoIndexWorker.cs:99-102,
  * 137-159`): N independent root graphs run concurrently, locks acquired
  * before any processing, and the first faulting root fails the whole
  * worker (no masked exit 0) while healthy roots are stopped.
  */
class WorkerSpec extends SparkSpec {

  private def dropBlocks(dir: String, blocks: Seq[Block]): Unit = {
    val sp = spark
    import sp.implicits._
    sp.createDataset(blocks).repartition(1).write.mode("append").parquet(dir)
  }

  private def root(tag: String, blocks: Seq[Block],
      reducers: Seq[ChainReducer]): (Worker.Root, StateStore) = {
    val blocksDir = tmpDir(s"wk-blocks-$tag")
    dropBlocks(blocksDir, blocks)
    val store = new StateStore(tmpDir(s"wk-store-$tag"), spark)
    val runner = new GraphRunner(spark, store, reducers, batchSize = 500)
    (Worker.Root(blocksDir, tmpDir(s"wk-cp-$tag"), runner,
      trigger = Trigger.AvailableNow()), store)
  }

  test("two healthy roots drain independently; both stores complete") {
    val b1 = ChainGen.generate(15, seed = 31L)
    val b2 = ChainGen.generate(25, seed = 32L, tag = "r2")
    val (r1, s1) = root("a", b1, Seq(new BlockSummaryReducer))
    val (r2, s2) = root("b", b2, Seq(new BlockSummaryReducer, new TxIndexReducer))
    Worker.run(spark, Seq(r1, r2))
    val schema = new BlockSummaryReducer().tables.head.schema
    assert(s1.read("blocks", schema).count() == b1.size)
    assert(s2.read("blocks", schema).count() == b2.size)
  }

  test("a faulting root fails the worker with the original error; healthy root is stopped") {
    val faulty = new ChainReducer {
      val name = "faulty"
      val tables = Seq(new BlockSummaryReducer().tables.head.copy(name = "faulty_t"))
      def rollForward(blocks: DataFrame, ctx: BatchContext): Map[String, DataFrame] =
        throw new IllegalStateException("boom-in-reducer")
    }
    val (r1, _) = root("c", ChainGen.generate(10, seed = 33L), Seq(faulty))
    val (r2, _) = root("d", ChainGen.generate(2000, seed = 34L, tag = "slow"),
      Seq(new BlockSummaryReducer, new TxIndexReducer,
        new WalletUtxoReducer(ChainGen.Watched)))
    val e = intercept[Throwable](Worker.run(spark, Seq(r1, r2)))
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
    assert(rootCause(e).getMessage.contains("boom-in-reducer"),
      s"expected the reducer fault, got: $e")
    assert(spark.streams.active.isEmpty, "healthy root must be stopped")
  }

  test("distinct-store requirement is enforced up front") {
    val store = new StateStore(tmpDir("wk-shared"), spark)
    def mk = new GraphRunner(spark, store, Seq(new BlockSummaryReducer),
      batchSize = 10)
    val r = Worker.Root(tmpDir("wk-x"), tmpDir("wk-y"), mk)
    val r2 = Worker.Root(tmpDir("wk-z"), tmpDir("wk-w"), mk)
    intercept[IllegalArgumentException](Worker.run(spark, Seq(r, r2)))
  }
}
