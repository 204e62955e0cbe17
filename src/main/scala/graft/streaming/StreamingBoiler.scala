package graft.streaming

import graft.queries.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming per-source boilerplate strip — the streaming twin of batch
  * q114, in the frozen-statistics discipline of [[StreamingBalance]] /
  * [[StreamingRetrieval]]: the per-source chrome set (line md5s at or
  * above the in-source frequency threshold) is FROZEN once from the
  * reference corpus by the SAME census plan batch q114 runs, and each
  * arriving document is rewritten the moment it lands by the SAME
  * scan-stage array filter (`TextAnalysis.stripProjection` — one
  * spelling, the surfaces cannot fork). STATELESS — no state store, no
  * watermark; the chrome map rides as a plan literal.
  *
  * Convergence: a chrome set frozen FROM the streamed corpus makes the
  * streamed rewrite EXACTLY batch q114's rows under any chunking (the
  * strip is a pure per-row function of (doc, chrome set)). The honest
  * divergence, stated: a stream strips against YESTERDAY's census — a
  * source the frozen corpus never saw has no chrome set and passes
  * through UNSTRIPPED (the conservative posture: with no frequency
  * evidence there is nothing principled to remove — the same reason
  * batch q114 exempts sources under BoilerMinDocs; the periodic batch
  * re-freeze picks new sources up, exactly as the retrieval twin
  * refreshes its df stats).
  *
  * Scale: the frozen map is semantically bounded — a line needs half a
  * source's docs to qualify, so each source contributes at most
  * ~2×lines-per-doc entries regardless of corpus size — the same
  * bound that lets batch q114 broadcast it.
  */
object StreamingBoiler {

  /** Freeze the per-source chrome sets from the reference corpus —
    * batch q114's census plan verbatim, collected to a map. */
  def frozenChrome(docs: DataFrame): Map[String, Seq[String]] = {
    val s = docs.sparkSession
    import s.implicits._
    TextAnalysis.boilerCensus(TextAnalysis.pageDocs(docs))
      .select(col("source"), col("lmd5"))
      .as[(String, String)].collect()
      .groupBy(_._1).map { case (src, rows) =>
        src -> rows.map(_._2).toSeq.sorted
      }
  }

  /** The strip over a (streaming or batch) document relation: batch
    * q114's rewrite against the frozen chrome map. Pure column
    * expressions — works unchanged under Structured Streaming append
    * mode with zero state. */
  def strip(docs: DataFrame, chrome: Map[String, Seq[String]]): DataFrame =
    TextAnalysis.stripProjection(
      TextAnalysis.pageDocs(docs),
      element_at(typedLit(chrome), col("source")))
}
