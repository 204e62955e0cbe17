package graft

import graft.core._
import graft.operators._
import graft.sources.{ChainGen, ChainProvider, FileChainProvider, MockChainProvider, ProviderSync}

/** The provider seam (S1-S5): intersection negotiation, the protocol-
  * faithful opening rollback, scripted mid-stream reorgs, reconnect-trim
  * after a crash — ports in shape of the reference's
  * `MockChainSyncProvider` contract (`Mocks/MockChainSyncProvider
  * .cs:29-139`) and `AdaptivePipelineDepthTest.cs:20-47`.
  */
class ProviderSpec extends SparkSpec {

  private def reducers = Seq(
    new BlockSummaryReducer,
    new TxIndexReducer,
    new WalletUtxoReducer(ChainGen.Watched),
    new BalanceSnapshotReducer(ChainGen.Watched))

  private def snapshotState(store: StateStore): Map[Long, Map[String, Long]] =
    store.read("balance_snapshots", reducers(3).tables.head.schema)
      .collect().groupBy(_.getLong(3)).map { case (slot, rows) =>
        slot -> rows.map(r => r.getString(1) -> r.getLong(4)).toMap
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

  test("adaptive pipeline depth: step map, clamps, monotonic, never below 1 (S3)") {
    import ChainProvider.adaptivePipelineDepth
    // table rows of AdaptivePipelineDepthTest.cs:15-21
    assert(adaptivePipelineDepth(100, 4L) == 1)
    assert(adaptivePipelineDepth(100, 20L) == 2)
    assert(adaptivePipelineDepth(100, 100L) == 5)
    assert(adaptivePipelineDepth(100, 500L) == 20)
    assert(adaptivePipelineDepth(100, 2000L) == 100)
    // clamps (:24-31)
    assert(adaptivePipelineDepth(100, 1000000L) == 100)
    assert(adaptivePipelineDepth(50, 1000000L) == 50)
    assert(adaptivePipelineDepth(1000, 10000L) == 500)
    // monotonic non-decreasing in the gap (:33-45)
    val gaps = Seq(0L, 4L, 20L, 100L, 500L, 2000L, 10000L, 50000L, 1000000L)
    val depths = gaps.map(adaptivePipelineDepth(1000, _))
    assert(depths == depths.sorted, s"not monotonic: $depths")
    // never below one even with a tiny max (:47)
    assert(adaptivePipelineDepth(1, 1000000L) == 1)
  }

  test("intersection negotiation: newest-first, rolled-back skipped, all-gone fails hard") {
    val chain = ChainGen.generate(10, seed = 2L)
    val p = new MockChainProvider(chain)
    val good = chain(4)
    // a newer candidate whose hash is no longer on the chain is skipped
    val rolledBack = Point("gone-hash", chain(7).slot)
    val events = p.startChainSync(
      Seq(Point(good.hash, good.slot), rolledBack)).toSeq
    assert(events.head == RollBack(Point(good.hash, good.slot), Exclusive),
      "stream must open with a rollback to the agreed intersection")
    val forwards = events.tail.collect { case RollForward(b) => b.slot }
    assert(forwards == chain.filter(_.slot > good.slot).map(_.slot))
    // every candidate rolled back → the reference's hard error
    val err = intercept[IllegalStateException] {
      p.startChainSync(Seq(Point("x", 123456L)))
    }
    assert(err.getMessage.contains("rolled back"))
  }

  test("full sync + mid-stream reorg through the seam matches the oracle") {
    val chain1 = ChainGen.generate(20, seed = 42L)
    val alt = ChainGen.generate(6, seed = 77L, startSlot = chain1(13).slot,
      tag = "alt")
    val finalChain = chain1.take(14) ++ alt
    val script: Seq[BlockEvent] =
      chain1.map(RollForward.apply) ++
        Seq(RollBack(Point(chain1(13).hash, chain1(13).slot), Exclusive)) ++
        alt.map(RollForward.apply)
    val provider = new MockChainProvider(finalChain, script = Some(script))
    val store = new StateStore(tmpDir("prov-reorg"), spark)
    val runner = new GraphRunner(spark, store, reducers, batchSize = 6)
    ProviderSync.run(runner, provider)
    assertOracle(store, ChainGen.balanceOracle(finalChain))
    assert(provider.tip.contains(Point(finalChain.last.hash, finalChain.last.slot)))
  }

  test("reconnect after crash: negotiates stored checkpoint, trims, replays remainder (S1/§3.3)") {
    val chain = ChainGen.generate(30, seed = 42L)
    val root = tmpDir("prov-reconnect")
    // first run sees only a prefix of the chain
    val store1 = new StateStore(root, spark)
    ProviderSync.run(
      new GraphRunner(spark, store1, reducers, batchSize = 7),
      new MockChainProvider(chain.take(18)))
    assert(snapshotState(store1).size == 18)

    // "crash"; a new instance reconnects — candidates come from the
    // stored checkpoint window, the provider's opening rollback trims,
    // the remainder replays exactly once
    val store2 = new StateStore(root, spark)
    val runner2 = new GraphRunner(spark, store2, reducers, batchSize = 7)
    val provider2 = new MockChainProvider(chain)
    ProviderSync.run(runner2, provider2)
    assert(provider2.connections == 1)
    assertOracle(store2, ChainGen.balanceOracle(chain))
    assert(store2.read("blocks", reducers.head.tables.head.schema).count()
      == chain.size, "no duplicated blocks after reconnect")
  }

  test("per-root runners: independent roots resume at their OWN safe points (O18/T10)") {
    val chain = ChainGen.generate(24, seed = 6L)
    // root A (header summary) synced to block 24; root B (utxo family)
    // synced only to block 10 — each on its own runner+store, the
    // reference's one-processor-per-root model
    val rootA = tmpDir("perroot-a")
    val rootB = tmpDir("perroot-b")
    ProviderSync.run(
      new GraphRunner(spark, new StateStore(rootA, spark),
        Seq(new BlockSummaryReducer), batchSize = 6),
      new MockChainProvider(chain))
    ProviderSync.run(
      new GraphRunner(spark, new StateStore(rootB, spark),
        Seq(new WalletUtxoReducer(ChainGen.Watched)), batchSize = 6),
      new MockChainProvider(chain.take(10)))

    // reconnect both against the full chain: A trims+noops at its tip,
    // B catches up from ITS safe point (not A's) — no cross-root coupling
    val storeA = new StateStore(rootA, spark)
    val runnerA = new GraphRunner(spark, storeA,
      Seq(new BlockSummaryReducer), batchSize = 6)
    val storeB = new StateStore(rootB, spark)
    val runnerB = new GraphRunner(spark, storeB,
      Seq(new WalletUtxoReducer(ChainGen.Watched)), batchSize = 6)
    assert(runnerA.latestCheckpointSlot == chain.last.slot)
    assert(runnerB.latestCheckpointSlot == chain(9).slot)
    ProviderSync.run(runnerA, new MockChainProvider(chain))
    ProviderSync.run(runnerB, new MockChainProvider(chain))
    assert(storeA.read("blocks",
      new BlockSummaryReducer().tables.head.schema).count() == chain.size)
    val utxoDefs = new WalletUtxoReducer(ChainGen.Watched).tables
    val unspent = WalletUtxoReducer.unspentView(
        storeB.read("utxo_created", utxoDefs(0).schema),
        storeB.read("utxo_spent", utxoDefs(1).schema))
      .groupBy(org.apache.spark.sql.functions.col("addressName"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("amount")).as("bal"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unspent == ChainGen.balanceOracle(chain).last._2.filter(_._2 > 0))
  }

  test("file provider drives the engine through the same seam") {
    val sp = spark
    import sp.implicits._
    val chain = ChainGen.generate(15, seed = 4L)
    val dir = tmpDir("prov-files")
    sp.createDataset(chain).repartition(1).write.mode("append").parquet(dir)
    val provider = new FileChainProvider(spark, dir)
    assert(provider.tip.contains(Point(chain.last.hash, chain.last.slot)))
    val store = new StateStore(tmpDir("prov-files-store"), spark)
    ProviderSync.run(
      new GraphRunner(spark, store, reducers, batchSize = 6), provider)
    assertOracle(store, ChainGen.balanceOracle(chain))
  }
}
