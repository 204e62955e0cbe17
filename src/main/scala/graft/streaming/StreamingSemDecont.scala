package graft.streaming

import graft.queries.Similarity
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One streamed semantic-decontamination verdict — batch q89's row. */
final case class SemDecontVerdict(vec_id: Long, max_cos: Double,
    contaminated: Boolean)

/** Streaming SEMANTIC decontamination — the streaming twin of batch q89,
  * completing the decontamination family's streaming side:
  * `StreamingCurate` carries the LEXICAL eval check (bloom + md5-128
  * gram index), this carries the EMBEDDING-space check — an arriving
  * vector gets its max-cosine-to-any-eval-item verdict the moment it
  * lands.
  *
  * Shape: STATELESS, the `StreamingProbe` discipline — the held-out
  * eval shard is frozen once into a broadcast array (vectors + norms,
  * the same rows batch q89 broadcasts), and each micro-batch is one
  * narrow mapPartitions; no state store, no watermark, nothing to
  * evict. The JVM kernels are the batch expressions' bit-identical
  * twins (`StreamingSemanticDedup.dotD`/`round4` — FloatDot's ordered
  * fold, Spark's HALF_UP round), and rounding happens AFTER the max
  * exactly as q89's `round(max(cos), 4)` — so verdicts converge
  * bit-identically with the batch entry under ANY chunking, pinned by
  * StreamingSemanticSpec.
  *
  * Eval-shard vectors themselves (vec_id ≡ 3 mod 10) pass through
  * silently — they ARE the reference, exactly as batch q89 excludes
  * them from its output.
  */
object StreamingSemDecont {

  /** Freeze the eval shard: (embedding, norm) rows, broadcast — the
    * q54/q89 "benchmark suites are small" argument; past that, the
    * batch q88 trained-IVF probe is the approximate scale path.
    */
  def frozenEvalVecs(embeddings: DataFrame)
      : Broadcast[Array[(Array[Float], Double)]] = {
    val s = embeddings.sparkSession
    import s.implicits._
    val rows = embeddings
      .select(col("vec_id").cast("long"), col("embedding"))
      .filter(col("vec_id") % 10 === 3)
      .as[(Long, Array[Float])].collect()
      .sortBy(_._1)
      .map { case (_, emb) =>
        (emb, math.sqrt(StreamingSemanticDedup.dotD(emb, emb)))
      }
    s.sparkContext.broadcast(rows)
  }

  def verdicts(vecs: DataFrame,
      ev: Broadcast[Array[(Array[Float], Double)]],
      tau: Double = Similarity.CosDecontTau): Dataset[SemDecontVerdict] = {
    import vecs.sparkSession.implicits._
    vecs.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val evs = ev.value
        it.flatMap { case (id, emb) =>
          if (id % 10 == 3 || evs.isEmpty) None
          else {
            val nrm = math.sqrt(StreamingSemanticDedup.dotD(emb, emb))
            var best = Double.NegativeInfinity
            evs.foreach { case (eemb, enrm) =>
              val c = StreamingSemanticDedup.dotD(emb, eemb) / (nrm * enrm)
              if (java.lang.Double.compare(c, best) > 0) best = c
            }
            val rounded = StreamingSemanticDedup.round4(best)
            Some(SemDecontVerdict(id, rounded, rounded >= tau))
          }
        }
      }
  }
}
