package graft.streaming

import graft.queries.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming √-temperature source rebalance — the streaming twin of
  * batch q112, in the frozen-statistics discipline of
  * [[StreamingRetrieval]]: the per-stratum acceptance rates
  * r = √(n_min / n) are FROZEN once from the reference corpus (one
  * tiny count aggregation; a ≤|strata|-entry map), and each arriving
  * document passes the identical deterministic-hash accept test the
  * moment it lands. STATELESS — no state store, no watermark; the
  * rate map rides as a plan literal, so the stream is one scan-stage
  * filter per micro-batch, exactly the batch plan's shape.
  *
  * Convergence: rates frozen FROM the streamed corpus make the
  * streamed sample EXACTLY batch q112's membership under any chunking
  * (the accept test is the same correctly-rounded `h/2⁴⁸ < r` double
  * comparison — see q112's exactness note). The honest divergence,
  * stated: a stream samples against YESTERDAY's distribution — a
  * stratum the frozen corpus never saw has no rate and is DROPPED
  * (the conservative posture: admitting it unsampled would flood the
  * mixture; the periodic batch re-freeze picks it up, exactly as the
  * retrieval twin refreshes its df stats).
  */
object StreamingBalance {

  /** Freeze per-stratum acceptance rates from the reference corpus —
    * the same counts and the same √(n_min/n) arithmetic batch q112
    * computes (Math.sqrt and `/` are IEEE correctly-rounded, so these
    * ARE the batch rates bit-for-bit).
    */
  def frozenRates(docs: DataFrame): Map[String, Double] = {
    val s = docs.sparkSession
    import s.implicits._
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val nMin = counts.values.min
    counts.map { case (l, n) => l -> math.sqrt(nMin.toDouble / n) }
  }

  /** The accept filter over a (streaming or batch) document relation:
    * keep iff `md5-uniform(doc_id) < r(lang)`. Pure column
    * expressions — works unchanged under Structured Streaming append
    * mode with zero state.
    */
  def sample(docs: DataFrame, rates: Map[String, Double]): DataFrame = {
    val rateOf = element_at(typedLit(rates), col("lang"))
    docs
      .withColumn("r", rateOf)
      .filter(col("r").isNotNull &&
        Dedup.hex12ToLong(
          md5(concat(lit("bal|"), col("doc_id").cast("string"))))
          .cast("double") / lit(281474976710656.0) < col("r"))
      .drop("r")
  }
}
