package graft.streaming

import graft.queries.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One document's admission inputs: its source and token count. */
final case class MixInput(doc_id: Long, source: String, n_tok: Long)

/** The admission verdict: whether the document made it into the mix,
  * and how many of its source's budget tokens were already spent when
  * it arrived.
  */
final case class MixVerdict(doc_id: Long, source: String,
    admitted: Boolean, spent_before: Long)

/** Streaming token-budget admission control — the streaming twin of
  * batch q68: an ingestion pipeline admits each arriving document into
  * the training mix until its source's token budget is spent, instead
  * of re-running the batch sampler over a growing corpus.
  *
  * Shape: the token projection is STATELESS per-row work
  * (`Dedup.mixTokEntries`, bit-identical to q68's batch stage); the
  * only state in the stream is ONE LONG per source — the tokens spent
  * so far — maintained by `flatMapGroupsWithState`, so state is bounded
  * by the source count forever. Greedy rule, same as batch: a document
  * is admitted iff spending starts strictly inside the budget; only
  * admitted documents advance the counter.
  *
  * Determinism contract: within a micro-batch each source's documents
  * are judged in the SAMPLER's canonical (salt, h, doc_id) order —
  * the same MD5-derived order q68 uses, recomputed per row from
  * doc_id — and across batches in arrival order. Because batch q68's
  * selection is a PREFIX of that order, a stream whose batches
  * partition it in order reproduces q68's admitted set and
  * per-document start offsets exactly, under ANY chunking —
  * StreamingMixSpec pins that convergence (which also pins the JVM
  * hash here against the engine's `hex12ToLong(md5(...))` spelling).
  *
  * Replay contract (at-least-once sources — r08 review, the
  * StreamingPack discipline): under the in-order delivery the
  * convergence contract already assumes, a REDELIVERED document
  * arrives with a canonical (salt, h, doc_id) key at or below its
  * source's high-water mark. Such rows are DROPPED — re-admitting one
  * would advance the spent counter a second time and permanently
  * shrink the admitted set vs q68. State stays bounded: the spent
  * long plus the three-long high-water key per source.
  */
object StreamingMix {

  /** q68's order key for one document: (salt, h) via the shared
    * `Dedup.md5Prefix48` fold — one digest instance per group chunk,
    * not one per row.
    */
  private def mixKey(md: java.security.MessageDigest,
      docId: Long): (Long, Long) = {
    val h = Dedup.md5Prefix48(md, s"mix|$docId")
    (h % Dedup.MixSalts, h)
  }

  /** Stateless projection over a streaming (or batch) documents
    * relation carrying (doc_id, source, text).
    */
  def tokEntries(docs: DataFrame): Dataset[MixInput] = {
    import docs.sparkSession.implicits._
    Dedup.mixTokEntries(docs)
      .select("doc_id", "source", "n_tok").as[MixInput]
  }

  def verdicts(in: Dataset[MixInput],
      budgets: Map[String, Long] = Dedup.MixBudgets.toMap)
      : Dataset[MixVerdict] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.source)
      .flatMapGroupsWithState[(Long, (Long, Long, Long)), MixVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (src, chunk, state) =>
          var (spent, hi) = state.getOption
            .getOrElse((0L, (Long.MinValue, Long.MinValue, Long.MinValue)))
          val budget = budgets.getOrElse(src, 0L)
          val md = java.security.MessageDigest.getInstance("MD5")
          val keyed = chunk.toSeq
            .map(m => (mixKey(md, m.doc_id), m))
            .sortBy { case ((salt, h), m) => (salt, h, m.doc_id) }
          val out = keyed.flatMap { case ((salt, h), m) =>
            val key = (salt, h, m.doc_id)
            if (Ordering[(Long, Long, Long)].lteq(key, hi))
              None // replayed under in-order delivery
            else {
              hi = key
              val admit = spent < budget
              val v = MixVerdict(m.doc_id, src, admit, spent)
              if (admit) spent += m.n_tok
              Some(v)
            }
          }
          state.update((spent, hi))
          out.iterator
      }
  }
}
