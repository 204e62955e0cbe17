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

  test("WhenAll + graceful stop: one root finishing does not exit the worker; progress surfaces per root") {
    import graft.streaming.Telemetry
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val b1 = ChainGen.generate(12, seed = 41L)
    val b2 = ChainGen.generate(18, seed = 42L, tag = "r2")
    val telA = new Telemetry(Map("block_summary" -> None))
    val telB = new Telemetry(Map("block_summary" -> None))
    def telRoot(tag: String, blocks: Seq[Block], tel: Telemetry,
        trigger: Trigger): (Worker.Root, StateStore) = {
      val blocksDir = tmpDir(s"wk-blocks-$tag")
      dropBlocks(blocksDir, blocks)
      val store = new StateStore(tmpDir(s"wk-store-$tag"), spark)
      val runner = new GraphRunner(spark, store, Seq(new BlockSummaryReducer),
        batchSize = 500, telemetry = Some(tel))
      (Worker.Root(blocksDir, tmpDir(s"wk-cp-$tag"), runner, trigger,
        telemetry = Some(tel)), store)
    }
    // root A drains and finishes; root B keeps running (ProcessingTime)
    val (rA, sA) = telRoot("pa", b1, telA, Trigger.AvailableNow())
    val (rB, sB) = telRoot("pb", b2, telB,
      Trigger.ProcessingTime("100 milliseconds"))
    val h = Worker.start(spark, Seq(rA, rB))
    def poll(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!cond) {
        assert(System.nanoTime() < deadline, s"timed out waiting: $what")
        Thread.sleep(50)
      }
    }
    try {
      val worker = Future(h.await())
      val schema = new BlockSummaryReducer().tables.head.schema
      poll("both roots drained")(
        sA.read("blocks", schema).count() == b1.size &&
          sB.read("blocks", schema).count() == b2.size)
      // root A (AvailableNow) terminates after draining; B must keep the
      // worker alive — the reference's P0-2 WhenAll regression
      poll("root A finished")(h.progress(sA.root)
        .exists(p => p.reducer == "block_summary" && p.progressPct == 100.0))
      Thread.sleep(500)
      assert(!worker.isCompleted,
        "worker exited after only ONE of two roots finished (WhenAny); " +
          "it must wait for all roots (WhenAll)")
      assert(h.isActive)
      // per-root progress rows report real tip distance
      val pb = h.progress(sB.root)
      assert(pb.exists(p => p.reducer == "block_summary" &&
        p.currentSlot == b2.last.slot && p.batches > 0))
      // graceful stop: await() returns cleanly, nothing is left running
      h.requestStop()
      Await.result(worker, 60.seconds)
      assert(!h.isActive)
      assert(spark.streams.active.isEmpty)
    } finally h.requestStop()
  }

  test("per-root telemetry attributes correctly; a conflating shared fallback is rejected") {
    import graft.streaming.Telemetry
    // two roots running SAME-NAMED reducers: per-root instances keep
    // each chain's slots/timings separate...
    val telA = new Telemetry(Map("block_summary" -> None))
    val telB = new Telemetry(
      Map("block_summary" -> None, "tx_index" -> Some("block_summary")))
    val (rA0, _) = root("ta", ChainGen.generate(6, seed = 51L),
      Seq(new BlockSummaryReducer))
    val (rB0, _) = root("tb", ChainGen.generate(9, seed = 52L, tag = "r2"),
      Seq(new BlockSummaryReducer, new TxIndexReducer))
    val rA = rA0.copy(telemetry = Some(telA))
    val rB = rB0.copy(telemetry = Some(telB))
    val h = Worker.start(spark, Seq(rA, rB))
    h.await()
    val pA = h.progress(rA.runner.store.root).map(_.reducer)
    val pB = h.progress(rB.runner.store.root).map(_.reducer).sorted
    assert(pA == Seq("block_summary"), s"root A rows: $pA")
    assert(pB == Seq("block_summary", "tx_index"), s"root B rows: $pB")
    // ...while the SHARED worker-level fallback cannot separate them:
    // name-keyed rows would interleave both chains' values, so the
    // configuration is rejected up front, not silently corrupted
    val (rA2, _) = root("ta2", ChainGen.generate(6, seed = 53L),
      Seq(new BlockSummaryReducer))
    val (rB2, _) = root("tb2", ChainGen.generate(9, seed = 54L, tag = "r3"),
      Seq(new BlockSummaryReducer, new TxIndexReducer))
    val e = intercept[IllegalArgumentException](
      Worker.start(spark, Seq(rA2, rB2), telemetry = Some(telB)))
    assert(e.getMessage.contains("share one Telemetry"), e.getMessage)
    // roots EXPLICITLY sharing one instance must be rejected the same
    // way — the mis-attribution is a property of the shared INSTANCE,
    // not of how it was shared (r07 review regression: the guard
    // previously checked only fallback users)
    val tShared = new Telemetry(Map("block_summary" -> None))
    val (rA3, _) = root("ta3", ChainGen.generate(6, seed = 55L),
      Seq(new BlockSummaryReducer))
    val (rB3, _) = root("tb3", ChainGen.generate(9, seed = 56L, tag = "r4"),
      Seq(new BlockSummaryReducer, new TxIndexReducer))
    val e2 = intercept[IllegalArgumentException](
      Worker.start(spark, Seq(rA3.copy(telemetry = Some(tShared)),
        rB3.copy(telemetry = Some(tShared)))))
    assert(e2.getMessage.contains("share one Telemetry"), e2.getMessage)
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
