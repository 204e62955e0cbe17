package graft.streaming

import graft.queries.{Dedup, Selection}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Stateless per-document signals + the exact-dup key, pre-fusion. */
final case class DocSignals(doc_id: Long, norm_md5: String, base: Int)

/** One streamed audit verdict — bits 0-3 of batch q79's `reasons`. */
final case class CurateVerdict(doc_id: Long, reasons: Int, keep: Boolean)

/** Streaming curation AUDIT — the streaming twin of batch q79's
  * lexical legs: every arriving document gets its decision record
  * (reasons bitmask, keep flag) the moment it lands, instead of
  * waiting for the next batch audit over the accumulated corpus.
  *
  *   bit 0 (1)  fails the q21/q67 quality thresholds
  *              ([[Selection.qualityFail]] — the SAME column
  *              expression batch q79 evaluates)
  *   bit 1 (2)  exact normalized duplicate of an EARLIER-ARRIVED doc
  *              (q61's norm_md5; see arrival-order note below)
  *   bit 2 (4)  eval-shard contamination above q54's threshold,
  *              against a FROZEN eval gram set ([[Dedup.gramsOf]] —
  *              the same tokenizer/gram joiner as batch
  *              `ngramEntries`)
  *   bit 3 (8)  IS the held-out eval shard (doc_id ≡ 3 mod 10)
  *
  * Bit 4 (semantic near-dup) is deliberately ABSENT: q70's verdict
  * requires clustering the full embedding corpus — a batch pass by
  * nature. The streaming audit covers the signals decidable per
  * document; the batch audit remains the full record.
  *
  * Shape: quality and the norm hash are codegen'd column expressions;
  * gram/contamination runs in ONE typed mapPartitions against a
  * broadcast eval gram set (the `bandEntries` precedent — array-lambda
  * expressions are interpreted CodegenFallback here, and the eval set
  * is bounded because benchmark suites are MBs, the q54/q79 argument).
  * The ONLY state in the stream is the exact-dup keeper table: one
  * `flatMapGroupsWithState` keyed on norm_md5 whose state is the
  * smallest doc_id seen — O(distinct contents) keys, 8 bytes each.
  *
  * Arrival-order contract (the streaming-vs-batch divergence, stated
  * rather than hidden): bit 1 marks a doc whose content arrived
  * earlier under a smaller doc_id. When arrival order follows doc_id
  * (replay/backfill — the convergence spec's setup), verdicts are
  * bit-identical to batch q79's `reasons & 15`. Under out-of-order
  * arrival, first-wins may keep a higher-id copy that batch would
  * drop — the same horizon batch re-audit over the accumulated corpus
  * closes, exactly as StreamingDedup defers to batch q32.
  */
object StreamingCurate {

  /** Freeze the eval shard's distinct word `DecontN`-grams into a
    * broadcast set. Driver-bounded by construction: the eval shard is
    * a benchmark suite (MBs), not the corpus — the q54/q79 broadcast
    * argument, made explicit here because a stream cannot re-derive
    * the reference side per micro-batch.
    */
  def frozenEvalGrams(evalDocs: DataFrame): Broadcast[Set[String]] = {
    val grams = Dedup.ngramEntries(evalDocs, Dedup.DecontN)
      .select(col("s")).distinct()
      .collect().map(_.getString(0)).toSet
    evalDocs.sparkSession.sparkContext.broadcast(grams)
  }

  /** Stateless leg over a streaming (or batch) `(doc_id, text)`
    * relation: quality + eval-shard bits as codegen'd expressions, the
    * contamination bit per-row against the frozen gram set, plus the
    * norm_md5 the stateful leg keys on. Eval-shard docs skip the
    * contamination check (batch q79 excludes them from `trg` — they
    * ARE the reference).
    */
  def signals(docs: DataFrame,
      evalGrams: Broadcast[Set[String]]): Dataset[DocSignals] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"),
        col("text"),
        Selection.qualityFail(col("text")).cast("int").as("f_qual"),
        md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")))
          .as("norm_md5"))
      .as[(Long, String, Int, String)]
      .mapPartitions { it =>
        val ev = evalGrams.value
        it.map { case (id, text, fQual, norm) =>
          val isEval = id % 10 == 3
          var base = fQual | (if (isEval) 8 else 0)
          if (!isEval) {
            val grams = Dedup.gramsOf(text, Dedup.DecontN)
            if (grams.nonEmpty) {
              var hits = 0
              grams.foreach(g => if (ev.contains(g)) hits += 1)
              if (hits.toDouble / grams.size > Dedup.DecontMax) base |= 4
            }
          }
          DocSignals(id, norm, base)
        }
      }
  }

  /** The full streamed audit: stateless signals fused with the
    * exact-dup verdict in one stateful pass. State per norm_md5 is the
    * keeper (smallest doc_id seen); a replayed keeper re-emits `keep`
    * (idempotent under at-least-once sources). Within one micro-batch
    * a group resolves by min doc_id — batch q61's exact semantics.
    *
    * `stateTtl` (StreamingDedup's contract): on an unbounded stream,
    * NoTimeout pins one 8-byte keeper per distinct content forever;
    * with a TTL, a content key idle that long is evicted, bounding
    * state by the ACTIVE working set. The trade: a copy arriving
    * beyond the TTL after its keeper is flagged `keep` again — the
    * dedup horizon is the TTL, which batch re-audit over the
    * accumulated corpus closes.
    */
  def audit(docs: DataFrame,
      evalGrams: Broadcast[Set[String]],
      stateTtl: Option[java.time.Duration] = None): Dataset[CurateVerdict] = {
    val sigs = signals(docs, evalGrams)
    import sigs.sparkSession.implicits._
    val timeoutKind = stateTtl.fold(GroupStateTimeout.NoTimeout())(_ =>
      GroupStateTimeout.ProcessingTimeTimeout())
    sigs.groupByKey(_.norm_md5)
      .flatMapGroupsWithState[Long, CurateVerdict](
        OutputMode.Append(), timeoutKind) {
        (_, chunk, state) =>
          if (state.hasTimedOut) {
            state.remove() // idle content key: evict, emit nothing
            Iterator.empty
          } else {
            val ds = chunk.toSeq.sortBy(_.doc_id)
            val keeper =
              math.min(state.getOption.getOrElse(Long.MaxValue),
                ds.head.doc_id)
            state.update(keeper)
            stateTtl.foreach(t => state.setTimeoutDuration(t.toMillis))
            ds.iterator.map { d =>
              val reasons = d.base | (if (d.doc_id != keeper) 2 else 0)
              CurateVerdict(d.doc_id, reasons, reasons == 0)
            }
          }
      }
  }
}
