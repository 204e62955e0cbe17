package graft.operators

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's example reducer family re-expressed Spark-first
  * (SURVEY.md §2: O1/O2, O5-O11, O14).
  */

/** The default 4-reducer graph (header → tx explode, watched-UTxO →
  * balance snapshots) — ONE factory shared by every tool/entrypoint so
  * the registered set cannot silently diverge between them.
  */
object ReducerGraphs {
  def default(watched: Map[String, String]): Seq[ChainReducer] = Seq(
    new BlockSummaryReducer,
    new TxIndexReducer,
    new WalletUtxoReducer(watched),
    new BalanceSnapshotReducer(watched))
}

/** Header projection (O1): block → one summary row.
  * Reference `BlockTestReducer.cs:24-36`.
  */
final class BlockSummaryReducer extends ChainReducer {
  val name = "block_summary"
  val tables = Seq(TableDef("blocks", StructType(Seq(
    StructField("hash", StringType),
    StructField("height", LongType),
    StructField("slot", LongType)))))

  def rollForward(blocks: DataFrame, ctx: BatchContext): Map[String, DataFrame] =
    Map("blocks" -> blocks.select(col("hash"), col("height"), col("slot")))
}

/** Block → transactions explode (O5) with positional index, denormalizing
  * block hash/height onto each row; consumes the PARENT's same-batch
  * output (O9's `.Local` visibility) for the block attributes.
  * Reference `TransactionTestReducer.cs:36-41`,
  * `DependentTransactionReducer.cs:28-32`.
  */
final class TxIndexReducer extends ChainReducer {
  val name = "tx_index"
  override val dependsOn = Some("block_summary")
  val tables = Seq(TableDef("transactions", StructType(Seq(
    StructField("txHash", StringType),
    StructField("txIdx", IntegerType),
    StructField("slot", LongType),
    StructField("blockHash", StringType),
    StructField("blockHeight", LongType)))))

  def rollForward(blocks: DataFrame, ctx: BatchContext): Map[String, DataFrame] = {
    val parentBlocks = ctx.parentOutput("block_summary", "blocks")
    val txs = blocks
      .select(col("hash"), posexplode(col("transactions")).as(Seq("txIdx", "tx")))
      .select(col("tx.txHash").as("txHash"),
        col("txIdx").cast("int").as("txIdx"), col("hash").as("blockHash"))
    Map("transactions" -> txs
      .join(parentBlocks.withColumnRenamed("hash", "blockHash"), "blockHash")
      .select(col("txHash"), col("txIdx"), col("slot"), col("blockHash"),
        col("height").as("blockHeight")))
  }
}

/** Watched-address UTxO tracking — the reference's core stateful operator
  * (O2 watched predicate, O6 input/output explode, O7 spend-matching
  * join, O8 same-batch create-then-spend visibility).
  * Reference `LovelaceBalanceByAddressReducer.cs:26-106`.
  *
  * Spend tombstones are EVENTS in their own slot-keyed table (`utxo_spent`)
  * rather than in-place `SpentSlot` updates: rolling back a spend is then
  * the same segment-pruned delete as any other retraction — the reference's
  * "resurrect" UPDATE (`:115-127`) falls out for free. The reference's
  * `WalletUtxo` view (with its SpentSlot column) is `unspentView`.
  */
final class WalletUtxoReducer(watched: Map[String, String]) extends ChainReducer {
  val name = "wallet_utxo"
  val tables = Seq(
    // compactWith: when the store folds old utxo_created segments, drop
    // pairs whose spend is FINAL (spentSlot at or before the rollback
    // frontier — the depth guard T6 proves no retraction can resurrect
    // them). The table then holds live UTxOs + the churn of the rollback
    // window, so per-batch spend matching reads O(live set), not
    // O(chain history) — the reference's `HasIndex(SpentSlot)` made
    // incremental (P9). unspentView is unchanged by construction.
    TableDef("utxo_created", StructType(Seq(
      StructField("txHash", StringType),
      StructField("txIndex", IntegerType),
      StructField("slot", LongType),
      StructField("address", StringType),
      StructField("addressName", StringType),
      StructField("amount", LongType))),
      compactWith = Some(Compaction.DropMatched(
        "utxo_spent", Seq("txHash", "txIndex"), "spentSlot"))),
    // The tombstone table compacts too: a FINAL spend (spentSlot at or
    // before the frontier) whose created pair is already dropped serves
    // no query — unspentView anti-joins it against nothing. Without this
    // the spent log grows O(chain) on both backends; with it, both UTxO
    // tables hold the live set + the rollback window's churn.
    TableDef("utxo_spent", StructType(Seq(
      StructField("txHash", StringType),
      StructField("txIndex", IntegerType),
      StructField("spentSlot", LongType))), slotCol = "spentSlot",
      compactWith = Some(Compaction.DropUnmatched(
        "utxo_created", Seq("txHash", "txIndex"), "spentSlot"))))

  private def watchedDf(spark: SparkSession): DataFrame =
    ChainReducers.watchedDf(spark, watched)

  def rollForward(blocks: DataFrame, ctx: BatchContext): Map[String, DataFrame] = {
    // O6: tx → created outputs with positional index; O2: watched filter
    // as a broadcast join on the raw address (P7: no decode in hot path).
    // `created` feeds BOTH returned tables (spent's matchable union
    // embeds it) — stage it once so the two collects share one
    // execution instead of running the explode+join subtree twice.
    val created = ctx.stage(blocks
      .select(col("slot"), explode(col("transactions")).as("tx"))
      .select(col("slot"), col("tx.txHash").as("txHash"),
        posexplode(col("tx.outputs")).as(Seq("txIndex", "o")))
      .select(col("txHash"), col("txIndex").cast("int").as("txIndex"),
        col("slot"), col("o.address").as("address"),
        col("o.lovelace").as("amount"))
      .join(broadcast(watchedDf(ctx.spark)), "address")
      .select(col("txHash"), col("txIndex"), col("slot"), col("address"),
        col("addressName"), col("amount")))
    // O6: tx → spent refs
    val refs = blocks
      .select(col("slot").as("spentSlot"), explode(col("transactions")).as("tx"))
      .select(col("spentSlot"), explode(col("tx.inputs")).as("in"))
      .select(col("in.txId").as("txHash"),
        col("in.index").cast("int").as("txIndex"), col("spentSlot"))
    // O7/O8: spend-matching equi-join against committed state ∪ this
    // batch's creates (read-your-own-writes, the `.Local ++ db` union).
    val matchable = ctx.table("utxo_created")
      .select(col("txHash"), col("txIndex"))
      .unionByName(created.select(col("txHash"), col("txIndex")))
    val spent = refs.join(matchable, Seq("txHash", "txIndex"), "left_semi")
    Map("utxo_created" -> created, "utxo_spent" -> spent)
  }
}

object WalletUtxoReducer {
  /** The reference's `WalletUtxo` table shape: created rows with a
    * nullable SpentSlot tombstone (`Models/WalletUtxo.cs:11-33`).
    */
  def utxoView(created: DataFrame, spent: DataFrame): DataFrame =
    created.join(spent, Seq("txHash", "txIndex"), "left_outer")

  def unspentView(created: DataFrame, spent: DataFrame): DataFrame =
    utxoView(created, spent).filter(col("spentSlot").isNull)
}

/** Per-block balance snapshots (O10 aggregation + O14 snapshot append):
  * one row per (block, watched address) holding the unspent balance as of
  * that block — an incrementally-maintained aggregate with full history.
  * Reference `WatchedAddressBalanceReducer.cs:79-96`.
  *
  * Incremental design: prior balance per address comes from this table's
  * own latest row (O14's latest-per-key read), batch deltas (+amount at
  * creation slot, −amount at spend slot) are cumulative-summed over the
  * batch's block grid. Work per batch is O(batch), not O(history).
  */
final class BalanceSnapshotReducer(watched: Map[String, String]) extends ChainReducer {
  // one name per address, ONE ADDRESS PER NAME: the snapshot grid keys
  // on addressName while carrying one row per address, so two addresses
  // sharing a name would double-join every delta and assign the running
  // sums nondeterministically between them — corrupt balances that the
  // prior-snapshot read then compounds forever. The reference's config
  // is name-keyed (one address per name); fail loudly on anything else.
  require(watched.values.toSet.size == watched.size,
    s"watched address names must be unique: ${watched.values.toSeq.sorted}")
  val name = "balance_by_address"
  override val dependsOn = Some("wallet_utxo")
  val tables = Seq(TableDef("balance_snapshots", StructType(Seq(
    StructField("reducer", StringType),
    StructField("addressName", StringType),
    StructField("address", StringType),
    StructField("slot", LongType),
    StructField("balance", LongType)))))

  def rollForward(blocks: DataFrame, ctx: BatchContext): Map[String, DataFrame] = {
    import org.apache.spark.sql.expressions.Window
    val spark = ctx.spark
    import spark.implicits._
    val created = ctx.parentOutput("wallet_utxo", "utxo_created")
    val spentRefs = ctx.parentOutput("wallet_utxo", "utxo_spent")
    val allCreated = ctx.tableWithBatch("wallet_utxo", "utxo_created")
    val plus = created.select(col("addressName"), col("slot"),
      col("amount").as("delta"))
    val minus = spentRefs
      .join(allCreated, Seq("txHash", "txIndex"))
      .select(col("addressName"), col("spentSlot").as("slot"),
        (-col("amount")).as("delta"))
    val deltas = plus.unionByName(minus)
      .groupBy(col("addressName"), col("slot"))
      .agg(sum(col("delta")).as("delta"))
    // Prior balance per address = latest committed snapshot (O14 read).
    // Every batch writes a snapshot for EVERY watched address at every
    // block (the grid below), so the newest committed segment alone
    // contains the latest balance of every address — the prior read is
    // O(previous batch), not O(snapshot history).
    val prior = ctx.latestSegment("balance_snapshots")
      .groupBy(col("addressName"))
      .agg(max_by(col("balance"), col("slot")).as("prior"))
    val grid = blocks.select(col("slot")).distinct()
      .crossJoin(broadcast(ChainReducers.watchedDf(spark, watched)))
    val w = Window.partitionBy(col("addressName")).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val snaps = grid
      .join(deltas, Seq("addressName", "slot"), "left_outer")
      .join(broadcast(prior), Seq("addressName"), "left_outer")
      .withColumn("balance",
        coalesce(col("prior"), lit(0L)) +
          sum(coalesce(col("delta"), lit(0L))).over(w))
      .select(lit(name).as("reducer"), col("addressName"), col("address"),
        col("slot"), col("balance"))
    Map("balance_snapshots" -> snaps)
  }
}

/** Shared helpers for the reducer family. */
object ChainReducers {
  /** The watched-address relation BOTH watched reducers join against —
    * one spelling, so the two reducers' views of the watched set cannot
    * drift (column naming, normalization) independently.
    */
  def watchedDf(spark: SparkSession,
      watched: Map[String, String]): DataFrame = {
    import spark.implicits._
    watched.toSeq.toDF("address", "addressName")
  }
}
