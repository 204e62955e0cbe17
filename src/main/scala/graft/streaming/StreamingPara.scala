package graft.streaming

import graft.queries.TextAnalysis
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One streamed keep-first verdict for a line OCCURRENCE: `keep` iff
  * this (doc_id, line_idx) is the digest's elected keeper.
  */
final case class ParaVerdict(lmd5: String, doc_id: Long, line_idx: Long,
    keep: Boolean)

/** Streaming keep-first PARAGRAPH dedup — the streaming twin of batch
  * q118, completing the twin family for this round's batch policies
  * (the r11 verdict's one uncovered policy). An arriving document
  * explodes into its page-line digest spine (batch q118's
  * [[TextAnalysis.lineIdxDigests]] — one spelling, the surfaces cannot
  * fork), and each digest's occurrences visit ONE
  * `flatMapGroupsWithState` keyed on the line md5 whose state is the
  * elected KEEPER occurrence — the (doc_id, line_idx) that arrived
  * first, elected as the min pair within its first micro-batch (batch
  * q61/q118's within-batch semantics). Every occurrence gets its
  * keep/drop verdict the moment it lands; [[rewrite]] applies a
  * verdict table to the documents through batch q118's own
  * [[TextAnalysis.keptProjection]] rewrite core.
  *
  * Arrival-order contract (the StreamingCurate discipline — stated,
  * not hidden): the keeper is FIRST-ARRIVED. When arrival order
  * follows doc_id (replay/backfill — the convergence spec's setup),
  * first-arrived ≡ min (doc_id, line_idx) and verdicts are
  * bit-identical to batch q118's election. Under out-of-order arrival
  * first-wins may keep a higher-id occurrence batch would drop — the
  * same horizon batch re-audit closes.
  *
  * Replay idempotence (the StreamingSemanticDedup lesson): the keeper
  * NEVER changes once elected — a redelivered occurrence recomputes
  * its verdict against the stored keeper and gets the identical
  * answer; re-electing from the redelivered chunk would let a
  * lower-id occurrence that arrived after the first delivery flip a
  * replayed keep into a drop.
  *
  * State: one (long, long) pair per DISTINCT line digest — exactly the
  * relation batch q118's winner election aggregates, held
  * incrementally. `stateTtl` (StreamingDedup's contract) bounds it by
  * the active working set on an unbounded stream: an idle digest is
  * evicted, and a copy arriving beyond the TTL is elected keeper
  * afresh — the dedup horizon is the TTL, closed by batch re-audit.
  */
object StreamingPara {

  /** The digest spine of a (streaming or batch) document relation —
    * batch q118's scan-stage projection verbatim: pure column
    * expressions (null text coalesces via the pageDocs defense), so it
    * runs unchanged under Structured Streaming append mode. */
  def lineSpine(docs: DataFrame): DataFrame =
    TextAnalysis.lineIdxDigests(TextAnalysis.pageDocs(docs))

  /** Per-occurrence keep-first verdicts — the query's ONLY stateful
    * operator. */
  def verdicts(docs: DataFrame,
      stateTtl: Option[java.time.Duration] = None): Dataset[ParaVerdict] = {
    val spine = lineSpine(docs)
    import spine.sparkSession.implicits._
    val timeoutKind = stateTtl.fold(GroupStateTimeout.NoTimeout())(_ =>
      GroupStateTimeout.ProcessingTimeTimeout())
    spine.select(col("lmd5"), col("doc_id"), col("line_idx"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), ParaVerdict](
        OutputMode.Append(), timeoutKind) { (key, chunk, state) =>
        if (state.hasTimedOut) {
          state.remove() // idle digest: evict, emit nothing
          Iterator.empty
        } else {
          val occ = chunk.map(t => (t._2, t._3)).toSeq
          // first-wins: elect only when no keeper exists; within the
          // electing micro-batch the keeper is the min pair (batch
          // semantics for occurrences that arrive together)
          val keeper = state.getOption.getOrElse(occ.min)
          if (!state.exists) state.update(keeper)
          stateTtl.foreach(t => state.setTimeoutDuration(t.toMillis))
          occ.iterator.map { case (d, i) =>
            ParaVerdict(key, d, i, keep = (d, i) == keeper)
          }
        }
      }
  }

  /** Apply a verdict table to its documents — batch q118's rewrite
    * tail verbatim: drop sets per doc, then the shared
    * [[TextAnalysis.keptProjection]] page rewrite (q114-shape rows).
    */
  def rewrite(docs: DataFrame, verdicts: DataFrame): DataFrame = {
    val drops = verdicts.where(!col("keep"))
      .groupBy(col("doc_id")).agg(collect_set(col("line_idx")).as("didx"))
    TextAnalysis.keptProjection(
      TextAnalysis.pageDocs(docs).join(drops, Seq("doc_id"), "left")
        .withColumn("didx",
          coalesce(col("didx"), array().cast("array<bigint>"))),
      l => !array_contains(col("didx"), l.getField("line_idx")))
  }
}
