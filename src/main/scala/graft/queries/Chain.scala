package graft.queries

import graft.core._
import graft.operators._
import graft.sources.ChainGen
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end chain-engine exposure in the driver's correctness artifact:
  * run the full reducer graph (forward → rollback → replay) over the
  * seeded synthetic chain and emit the balance-snapshot history.
  *
  * Oracle (closing round-5's rows-only caveat): the INPUT chain is a
  * pure function of the seed, so `q60Sql` inlines it as VALUES rows
  * (inputs, not results — nothing of the engine's answer leaks into
  * the oracle) and re-derives every per-block balance with one
  * windowed-set SQL expression: an output counts toward (addr, slot S)
  * iff it was created at or before S and not spent at or before S.
  * Rollback + replay of the same suffix must land on the linear fold —
  * exactly what UtxoOracleSpec's imperative oracle asserts in-repo,
  * now also hash-checked by the driver.
  */
object Chain extends QueryModule {

  private val q60Sql = {
    val blocks = ChainGen.generate(15, seed = 42L)
    val outs = for {
      b <- blocks; tx <- b.transactions; (o, i) <- tx.outputs.zipWithIndex
    } yield s"('${tx.txHash}', $i, '${o.address}', ${o.lovelace}, ${b.slot})"
    val ins = for {
      b <- blocks; tx <- b.transactions; in <- tx.inputs
    } yield s"('${in.txId}', ${in.index}, ${b.slot})"
    val slots = blocks.map(b => s"(${b.slot})")
    val watched = ChainGen.Watched.toSeq.sorted
      .map { case (a, n) => s"('$a', '$n')" }
    s"""WITH outs(tx, ix, address, amount, cslot) AS (
       |  VALUES ${outs.mkString(", ")}),
       |ins(tx, ix, sslot) AS (VALUES ${ins.mkString(", ")}),
       |slots(slot) AS (VALUES ${slots.mkString(", ")}),
       |watched(address, addressName) AS (VALUES ${watched.mkString(", ")}),
       |o2 AS (SELECT o.*, i.sslot
       |       FROM outs o LEFT JOIN ins i ON o.tx = i.tx AND o.ix = i.ix)
       |SELECT 'balance_by_address' AS reducer, w.addressName, w.address,
       |  CAST(s.slot AS BIGINT) AS slot,
       |  CAST(COALESCE(SUM(o2.amount) FILTER (
       |    WHERE o2.cslot <= s.slot
       |      AND (o2.sslot IS NULL OR o2.sslot > s.slot)), 0) AS BIGINT)
       |    AS balance
       |FROM slots s
       |CROSS JOIN watched w
       |LEFT JOIN o2 ON o2.address = w.address
       |GROUP BY 1, 2, 3, 4
       |ORDER BY slot, addressName""".stripMargin
  }

  private def q60(s: SparkSession, d: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("q60chain").toString
    // try/finally: a reducer or store failure must not leak the scratch
    // store either — each invocation previously left a full state-store
    // tree in /tmp forever (r07 review, exception path included)
    try {
      val reducers = ReducerGraphs.default(ChainGen.Watched)
      val store = new StateStore(root, s)
      val runner = new GraphRunner(s, store, reducers, batchSize = 5)
      val blocks = ChainGen.generate(15, seed = 42L)
      runner.processEvents(blocks.map(RollForward.apply))
      // exercise the retraction path inside the artifact too
      val cut = blocks(9)
      runner.applyRollback(Point(cut.hash, cut.slot), Exclusive)
      runner.processEvents(blocks.drop(10).map(RollForward.apply))
      // schema located by TABLE NAME, not positional index — reducers(3)
      // silently broke on any reorder of ReducerGraphs.default (r07
      // review)
      val snapSchema = reducers.flatMap(_.tables)
        .find(_.name == "balance_snapshots")
        .getOrElse(throw new IllegalStateException(
          "balance_snapshots table missing from the default graph"))
        .schema
      // eager localCheckpoint pins the (bounded, 15-block) result rows
      // so the scratch store can be deleted in the finally
      store.read("balance_snapshots", snapSchema)
        .orderBy(col("slot"), col("addressName"))
        .localCheckpoint()
    } finally Scratch.deleteTree(root)
  }

  override def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q60_chain_engine", q60, Some(q60Sql)),
  )
}
