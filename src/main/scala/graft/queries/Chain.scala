package graft.queries

import graft.core._
import graft.operators._
import graft.sources.ChainGen
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end chain-engine exposure in the driver's correctness artifact:
  * run the full reducer graph (forward → rollback → replay) over the
  * seeded synthetic chain and emit the balance-snapshot history. No SQL
  * oracle exists for a stateful engine run (driver records the rows-only
  * check); the hard assertions live in UtxoOracleSpec against the
  * independent imperative oracle — this entry proves the engine runs
  * end-to-end inside the driver's harness and yields deterministic rows.
  */
object Chain extends QueryModule {

  private def q60(s: SparkSession, d: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("q60chain").toString
    val reducers = ReducerGraphs.default(ChainGen.Watched)
    val store = new StateStore(root, s)
    val runner = new GraphRunner(s, store, reducers, batchSize = 5)
    val blocks = ChainGen.generate(15, seed = 42L)
    runner.processEvents(blocks.map(RollForward.apply))
    // exercise the retraction path inside the artifact too
    val cut = blocks(9)
    runner.applyRollback(Point(cut.hash, cut.slot), Exclusive)
    runner.processEvents(blocks.drop(10).map(RollForward.apply))
    store.read("balance_snapshots", reducers(3).tables.head.schema)
      .orderBy(col("slot"), col("addressName"))
  }

  override def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q60_chain_engine", q60, None),
  )
}
