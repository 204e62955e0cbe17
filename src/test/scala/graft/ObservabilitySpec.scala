package graft

import graft.core._
import graft.operators._
import graft.sources.ChainGen
import graft.streaming.{ChainIngest, Telemetry}
import org.apache.spark.sql.streaming.Trigger

/** §2.12 observability: progress rows advance during ingestion, the
  * progress formula matches the reference's `(current − start) /
  * (tip − start)` with dependent inheritance
  * (`CardanoIndexWorker.Dashboard.cs:318-355`), and per-reducer batch
  * timings accumulate (`CardanoIndexWorker.Telemetry.cs:9-110`).
  */
class ObservabilitySpec extends SparkSpec {

  private def reducers = Seq(
    new BlockSummaryReducer,
    new TxIndexReducer,
    new WalletUtxoReducer(ChainGen.Watched),
    new BalanceSnapshotReducer(ChainGen.Watched))

  private def depMap = reducers.map(r => r.name -> r.dependsOn).toMap

  test("cyclic reducer-dependency maps are rejected at construction") {
    // progressPct recurses parent links; a caller-built cycle (or
    // self-reference) would StackOverflowError inside the telemetry
    // lock (r07 review regression)
    import graft.streaming.Telemetry
    intercept[IllegalArgumentException](
      new Telemetry(Map("a" -> Some("b"), "b" -> Some("a"))))
    intercept[IllegalArgumentException](
      new Telemetry(Map("a" -> Some("a"))))
    // acyclic chains still construct
    new Telemetry(Map("a" -> Some("b"), "b" -> None))
  }

  test("progress advances across batches; formula and inheritance match the reference") {
    val blocks = ChainGen.generate(20, seed = 42L)
    val tel = new Telemetry(depMap)
    tel.observeTip(blocks.last.slot) // provider tip (S5) seeds the gauge
    val store = new StateStore(tmpDir("obs"), spark)
    val runner = new GraphRunner(spark, store, reducers, batchSize = 5,
      telemetry = Some(tel))

    runner.processEvents(blocks.take(10).map(RollForward.apply))
    val mid = tel.snapshot
    assert(mid.forall(_.batches > 0), s"timings must accumulate: $mid")
    assert(mid.forall(_.meanBatchSec > 0.0))
    val midPct = mid.map(p => p.reducer -> p.progressPct).toMap
    assert(midPct.values.forall(p => p > 0.0 && p < 100.0),
      s"mid-sync progress must be partial: $midPct")
    // reference formula for a root, spelled out
    val start = -1L
    val current = blocks(9).slot
    val expected = math.min(
      (current - start).toDouble / (blocks.last.slot - start) * 100.0, 99.99)
    assert(math.abs(midPct("block_summary") - expected) < 1e-9)
    // dependents inherit the root's progress recursively
    assert(midPct("tx_index") == midPct("block_summary"))
    assert(midPct("balance_by_address") == midPct("wallet_utxo"))

    runner.processEvents(blocks.drop(10).map(RollForward.apply))
    val end = tel.snapshot
    assert(end.forall(_.progressPct == 100.0), s"at tip: $end")
    assert(end.forall(p => p.currentSlot == blocks.last.slot))
    // progress table is queryable
    val df = tel.progressDf(spark)
    assert(df.count() == reducers.size)
    assert(df.columns.contains("progressPct"))
  }

  test("streaming ingestion feeds the listener: batch rows recorded, progress reaches 100%") {
    val sp = spark
    import sp.implicits._
    val blocks = ChainGen.generate(12, seed = 8L)
    val blocksDir = tmpDir("obs-blocks")
    sp.createDataset(blocks).repartition(1).write.mode("append").parquet(blocksDir)
    val tel = new Telemetry(depMap)
    tel.observeTip(blocks.last.slot)
    val store = new StateStore(tmpDir("obs-store"), spark)
    val runner = new GraphRunner(spark, store, reducers, batchSize = 500,
      telemetry = Some(tel))
    val q = ChainIngest.start(spark, blocksDir, tmpDir("obs-cp"), runner,
      trigger = Trigger.AvailableNow(), telemetry = Some(tel))
    q.awaitTermination(120000)
    // listener captured at least one data-bearing micro-batch
    assert(tel.streamBatches.exists(_._2 > 0),
      s"stream batches: ${tel.streamBatches}")
    assert(tel.snapshot.forall(_.progressPct == 100.0))
  }
}
