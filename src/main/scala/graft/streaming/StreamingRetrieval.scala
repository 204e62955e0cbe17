package graft.streaming

import graft.queries.{Selection, TextAnalysis}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One streamed chunk score — batch q108's pre-top-k row shape. */
final case class ChunkScore(doc_id: Long, chunk_id: Long, start_tok: Long,
    bm25: Double)

/** Frozen collection statistics for the streaming retrieval scorer:
  * chunk-level df per query term plus the collection sizes, computed
  * ONCE over the indexed corpus and broadcast. A few longs — the
  * smallest frozen state any streaming twin in this repo carries.
  */
final class RetrievalStats(val df: Map[String, Long], val nChunks: Long,
    val totTokens: Long) extends Serializable

/** Streaming chunk-level retrieval scoring — the streaming twin of
  * batch q108, completing the retrieval family's streaming side
  * (q105's chunker is already stream-safe — it IS the stateless scan
  * stage both engines run): an arriving document is chunked and every
  * chunk scored against the fixed query the moment it lands, under
  * statistics FROZEN from the indexed collection.
  *
  * Shape: STATELESS, the [[StreamingProbe]]/[[StreamingSemDecont]]
  * discipline — df and the collection sizes are frozen once into a
  * broadcast [[RetrievalStats]] (a handful of longs; the retrieval
  * analogue of the frozen band index / frozen quantizer), and each
  * micro-batch is one narrow mapPartitions: chunk, tokenize, tf-count,
  * score. No state store, no watermark, nothing to evict; the top-k is
  * a downstream aggregation over the sink, kept out of the stream so
  * append mode stays aggregation-free (q108's TakeOrdered is the batch
  * report over whatever accumulated).
  *
  * Convergence contract (StreamingRetrievalSpec): with stats frozen
  * FROM the streamed corpus, scores are BIT-identical to batch q108's
  * scored relation under any chunking of the stream — the JVM kernel
  * mirrors the batch column expression operation-for-operation (long
  * subtraction/multiplication before the 2.2 promote, the exact 0.3 /
  * 0.9 literals, per-term adds in fixed `BmQuery` order, HALF_UP
  * 4-dp round — [[StreamingSemanticDedup.round4]]). The honest
  * divergence, stated: a stream is scored against YESTERDAY's
  * statistics — a term df the frozen collection never saw scores at
  * df = 0 (maximum idf, the standard unseen-term posture), and the
  * periodic batch re-index refreshes the stats, exactly as the dedup
  * twins defer to their batch re-audits.
  */
object StreamingRetrieval {

  /** Freeze the collection stats from the indexed corpus — the same
    * tokenization ([[TextAnalysis.chunkWords]]) and the same dl/df
    * aggregations batch q108 runs, so the frozen numbers are the
    * batch numbers. Driver cost: one |query|-row df table plus two
    * longs.
    */
  def frozenStats(docs: DataFrame): Broadcast[RetrievalStats] = {
    val s = docs.sparkSession
    import s.implicits._
    val words = TextAnalysis.chunkWords(docs)
    val dl = words.groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("dl"))
    val Seq((nChunks, totTokens)) =
      dl.agg(count(lit(1)), sum(col("dl"))).as[(Long, Option[Long])]
        .collect().toSeq.map { case (n, t) => (n, t.getOrElse(0L)) }
    val df = words.filter(col("w").isin(TextAnalysis.BmQuery: _*))
      .groupBy(col("doc_id"), col("chunk_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("w")).agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toMap
    s.sparkContext.broadcast(new RetrievalStats(df, nChunks, totTokens))
  }

  // the batch extraction is regexp_extract_all(lower(text), '[a-z]+'):
  // java.util.regex either way; Locale.ROOT lowercase matches Spark's
  // UTF8String.toLowerCase on the full Unicode mappings (Kelvin sign →
  // 'k' included), so the streamed token stream is the batch one
  private val WordPat = java.util.regex.Pattern.compile("[a-z]+")

  /** Score one chunk's text against the fixed query under frozen
    * stats; None when no query term occurs (batch q108's tf relation
    * has no row ⇒ no scored chunk). Exposed for the spec's df=0
    * unseen-term check.
    */
  private[graft] def scoreChunk(chunkText: String,
      st: RetrievalStats): Option[Double] = {
    val m = WordPat.matcher(chunkText.toLowerCase(java.util.Locale.ROOT))
    var dl = 0L
    val tf = scala.collection.mutable.Map.empty[String, Long]
    while (m.find()) {
      dl += 1
      val w = m.group()
      if (TextAnalysis.BmQuery.contains(w))
        tf.update(w, tf.getOrElse(w, 0L) + 1L)
    }
    if (tf.isEmpty) None
    else Some(StreamingSemanticDedup.round4(
      TextAnalysis.BmQuery.foldLeft(0.0) { (acc, t) =>
        val f = tf.getOrElse(t, 0L)
        // tf = 0 ⇒ the pivot's NULL ⇒ coalesce 0.0, exactly
        if (f == 0L) acc
        else {
          val dfT = st.df.getOrElse(t, 0L)
          // operation-for-operation the batch expression: the long ops
          // ((n_chunks − df) · tf) and (dl · n_chunks) happen in LONG,
          // then promote — a double-first spelling would round
          // differently at the 53-bit edge
          acc + ((st.nChunks - dfT) * f) * 2.2 /
            (f + 0.3 + 0.9 *
              ((dl * st.nChunks).toDouble / st.totTokens.toDouble))
        }
      }))
  }

  /** The streaming scorer over a (streaming or batch) `(doc_id, text)`
    * relation: q105's chunker (the SAME `Selection.chunkDocs` stage —
    * stateless, so stream-legal as-is) followed by one scoring
    * mapPartitions against the broadcast stats.
    */
  def scores(docs: DataFrame,
      stats: Broadcast[RetrievalStats]): Dataset[ChunkScore] = {
    import docs.sparkSession.implicits._
    Selection.chunkDocs(docs)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
      .as[(Long, Long, String)]
      .mapPartitions { it =>
        val st = stats.value
        it.flatMap { case (id, cid, text) =>
          scoreChunk(text, st).map(s =>
            ChunkScore(id, cid, cid * Selection.ChunkS.toLong, s))
        }
      }
  }
}
