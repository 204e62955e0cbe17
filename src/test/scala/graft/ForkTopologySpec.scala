package graft

import graft.core._
import graft.operators._
import graft.sources.ChainGen
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Fork topology through the full engine with state: TWO stateful
  * children of one parent (the reference's fork-shaped dependency tests,
  * `ForkBranchAtomicityTest.cs:21-60` / `DependentDataConsumptionTest
  * .cs:25-72`): both siblings consume the parent's same-batch output,
  * both commit atomically with it, both rewind on rollback, both
  * reconverge on replay.
  */
class ForkTopologySpec extends SparkSpec {

  /** Second sibling of wallet_utxo: cumulative created-UTxO count per
    * watched address per block — a different stateful aggregate over the
    * same parent output.
    */
  private class UtxoCountReducer extends ChainReducer {
    val name = "utxo_count"
    override val dependsOn = Some("wallet_utxo")
    val tables = Seq(TableDef("utxo_counts", StructType(Seq(
      StructField("addressName", StringType),
      StructField("slot", LongType),
      StructField("n_created", LongType)))))

    def rollForward(blocks: DataFrame, ctx: BatchContext): Map[String, DataFrame] = {
      import org.apache.spark.sql.expressions.Window
      val created = ctx.parentOutput("wallet_utxo", "utxo_created")
      val perSlot = created.groupBy(col("addressName"), col("slot"))
        .agg(count(lit(1)).as("d"))
      val prior = ctx.latestSegment("utxo_counts")
        .groupBy(col("addressName"))
        .agg(max_by(col("n_created"), col("slot")).as("prior"))
      val names = ctx.spark.createDataFrame(
        ChainGen.Watched.values.toSeq.map(org.apache.spark.sql.Row(_)).asJava,
        StructType(Seq(StructField("addressName", StringType))))
      val grid = blocks.select(col("slot")).distinct()
        .crossJoin(broadcast(names))
      val w = Window.partitionBy(col("addressName")).orderBy(col("slot"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Map("utxo_counts" -> grid
        .join(perSlot, Seq("addressName", "slot"), "left_outer")
        .join(broadcast(prior), Seq("addressName"), "left_outer")
        .select(col("addressName"), col("slot"),
          (coalesce(col("prior"), lit(0L)) +
            sum(coalesce(col("d"), lit(0L))).over(w)).as("n_created")))
    }
  }

  private def reducers = Seq(
    new BlockSummaryReducer,
    new WalletUtxoReducer(ChainGen.Watched),
    new BalanceSnapshotReducer(ChainGen.Watched),
    new UtxoCountReducer)

  /** Independent count oracle: created watched outputs per address per
    * block prefix.
    */
  private def countOracle(blocks: Seq[Block]): Map[Long, Map[String, Long]] = {
    var acc = ChainGen.Watched.values.map(_ -> 0L).toMap
    blocks.map { b =>
      b.transactions.flatMap(_.outputs).foreach { o =>
        ChainGen.Watched.get(o.address).foreach(n => acc = acc.updated(n, acc(n) + 1))
      }
      b.slot -> acc
    }.toMap
  }

  test("fork: both stateful siblings track the parent through forward, rollback, replay") {
    val blocks = ChainGen.generate(30, seed = 42L)
    val store = new StateStore(tmpDir("fork"), spark)
    val runner = new GraphRunner(spark, store, reducers, batchSize = 7)
    runner.processEvents(blocks.map(RollForward.apply))

    def readCounts(): Map[Long, Map[String, Long]] =
      store.read("utxo_counts", StructType(Seq(
        StructField("addressName", StringType),
        StructField("slot", LongType),
        StructField("n_created", LongType))))
        .collect().groupBy(_.getLong(1)).map { case (slot, rows) =>
          slot -> rows.map(r => r.getString(0) -> r.getLong(2)).toMap
        }
    def readBalances(): Map[Long, Map[String, Long]] =
      store.read("balance_snapshots", reducers(2).tables.head.schema)
        .collect().groupBy(_.getLong(3)).map { case (slot, rows) =>
          slot -> rows.map(r => r.getString(1) -> r.getLong(4)).toMap
        }

    val cntOracle = countOracle(blocks)
    val balOracle = ChainGen.balanceOracle(blocks).toMap
    assert(readCounts() == cntOracle)
    assert(readBalances() == balOracle)

    // rollback rewinds BOTH siblings with the parent
    val cut = blocks(19)
    runner.applyRollback(Point(cut.hash, cut.slot), Exclusive)
    assert(readCounts() == countOracle(blocks.take(20)))
    assert(readBalances() == ChainGen.balanceOracle(blocks.take(20)).toMap)

    // replay reconverges both
    runner.processEvents(blocks.drop(20).map(RollForward.apply))
    assert(readCounts() == cntOracle)
    assert(readBalances() == balOracle)
  }
}
