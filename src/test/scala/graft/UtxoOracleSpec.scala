package graft

import graft.core._
import graft.operators._
import graft.sources.ChainGen
import org.apache.spark.sql.functions._

/** The §5.3 oracle discipline, replicated in shape from the reference's
  * `LovelaceBalanceRollbackTest` (`EndToEnd/LovelaceBalanceRollbackTest
  * .cs:60-188`): replay a fixed chain forward asserting watched balances
  * after EVERY block (the snapshot table holds exactly those states),
  * roll back, assert the rewound state, replay, assert every intermediate
  * again. The oracle is an independent imperative fold (ChainGen
  * .balanceOracle) — a different algorithm from the engine's set-based
  * plan.
  */
class UtxoOracleSpec extends SparkSpec {

  private def reducers = Seq(
    new BlockSummaryReducer,
    new TxIndexReducer,
    new WalletUtxoReducer(ChainGen.Watched),
    new BalanceSnapshotReducer(ChainGen.Watched))

  /** snapshot table → (slot -> addressName -> balance) */
  private def snapshotState(store: StateStore): Map[Long, Map[String, Long]] = {
    val df = store.read("balance_snapshots",
      reducers(3).tables.head.schema)
    df.collect().groupBy(_.getLong(3)).map { case (slot, rows) =>
      slot -> rows.map(r => r.getString(1) -> r.getLong(4)).toMap
    }
  }

  private def assertMatchesOracle(store: StateStore,
      oracle: Seq[(Long, Map[String, Long])]): Unit = {
    val got = snapshotState(store)
    assert(got.size == oracle.size,
      s"snapshot count ${got.size} != oracle ${oracle.size}")
    oracle.foreach { case (slot, bal) =>
      assert(got.contains(slot), s"missing snapshot for slot $slot")
      assert(got(slot) == bal, s"slot $slot: got ${got(slot)}, oracle $bal")
    }
  }

  test("forward replay matches oracle at every block; rollback rewinds; replay converges") {
    val blocks = ChainGen.generate(40, seed = 42L)
    val oracle = ChainGen.balanceOracle(blocks)
    val store = new StateStore(tmpDir("utxo-oracle"), spark)
    val runner = new GraphRunner(spark, store, reducers, batchSize = 7)

    // --- forward: every-prefix assertion via the snapshot history ---
    runner.processEvents(blocks.map(RollForward.apply))
    assertMatchesOracle(store, oracle)

    // blocks/transactions tables consistent with the chain
    val nBlocks = store.read("blocks", reducers.head.tables.head.schema).count()
    assert(nBlocks == blocks.size)
    val nTx = store.read("transactions", reducers(1).tables.head.schema).count()
    assert(nTx == blocks.map(_.transactions.size).sum)

    // unspent view matches the oracle's live set at the tip
    val utxoDefs = reducers(2).tables
    val unspent = WalletUtxoReducer.unspentView(
        store.read("utxo_created", utxoDefs(0).schema),
        store.read("utxo_spent", utxoDefs(1).schema))
      .groupBy(col("addressName")).agg(sum(col("amount")).as("bal"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tipBal = oracle.last._2.filter(_._2 > 0)
    assert(unspent == tipBal)

    // --- rollback the last 10 blocks (Exclusive at block 29) ---
    val cut = blocks(29)
    runner.applyRollback(Point(cut.hash, cut.slot), Exclusive)
    assertMatchesOracle(store, oracle.take(30))

    // checkpoint window rewound with the data (atomicity, T3)
    val cps = store.manifest.checkpoints
    assert(cps.values.forall(w => CheckpointWindow.latest(w).forall(_.slot <= cut.slot)))

    // --- replay the retracted suffix, asserting every intermediate ---
    runner.processEvents(blocks.drop(30).map(RollForward.apply))
    assertMatchesOracle(store, oracle)
  }

  test("inclusive rollback destroys the rollback point itself") {
    val blocks = ChainGen.generate(12, seed = 7L)
    val oracle = ChainGen.balanceOracle(blocks)
    val store = new StateStore(tmpDir("utxo-incl"), spark)
    val runner = new GraphRunner(spark, store, reducers, batchSize = 5)
    runner.processEvents(blocks.map(RollForward.apply))
    val cut = blocks(8)
    runner.applyRollback(Point(cut.hash, cut.slot), Inclusive)
    assertMatchesOracle(store, oracle.take(8)) // block 8's slot is gone too
  }

  test("rollback depth guard fails fast (T6)") {
    val blocks = ChainGen.generate(10, seed = 1L)
    val store = new StateStore(tmpDir("utxo-depth"), spark)
    val runner = new GraphRunner(spark, store, reducers, batchSize = 100,
      maxRollbackSlots = 5)
    runner.processEvents(blocks.map(RollForward.apply))
    val err = intercept[IllegalArgumentException] {
      runner.applyRollback(Point("deep", blocks.head.slot - 100), Inclusive)
    }
    assert(err.getMessage.contains("MaxRollbackSlots"))
  }
}
