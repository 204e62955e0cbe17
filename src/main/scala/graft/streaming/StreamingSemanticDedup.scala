package graft.streaming

import graft.queries.Similarity
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One streamed semantic verdict: the arriving vector's cluster and its
  * lowest-id τ-close earlier neighbor there (`-1` = none, keep).
  */
final case class SemVerdict(vec_id: Long, cid: Long, dup_of: Long)

/** Streaming SEMANTIC dedup — the streaming twin of batch q70
  * (SemDeDup), completing the streaming dedup family: `StreamingDedup`
  * covers the lexical MinHash signal, this covers the embedding-space
  * signal no shingle can see. An arriving vector is assigned to its
  * nearest frozen centroid (stateless, broadcast model — the
  * stream-static discipline of `StreamingProbe`) and checked against
  * the cluster's earlier arrivals; it gets its keep/dup verdict the
  * moment it lands.
  *
  * Numeric contract: the JVM kernels are BIT-IDENTICAL twins of the
  * batch expressions — `dotD` is `FloatDot`'s ordered left-to-right
  * double fold, `round4` is Spark `round`'s
  * `BigDecimal.valueOf(_).setScale(4, HALF_UP)`, centroid ties resolve
  * by min cid exactly like `centroidRanks`' `(ccos DESC, cid)`
  * row_number, and the NaN ordering of a zero-norm vector follows
  * `Double.compare` like Spark's double ordering. StreamingSemanticSpec
  * pins bit-identical convergence with batch q70 under vec_id-order
  * arrival — any drift in a rounding or tie-break breaks the spec.
  *
  * State: per cluster, the members seen so far (id, embedding, norm) —
  * the index the batch pair join implicitly builds, held incrementally.
  * Capped at `maxCluster` members (StreamingDedup's stop-bucket
  * argument): a saturated cluster stops ADMITTING members (later
  * arrivals still get verdicts against the stored ones), so state is
  * bounded by clusters × maxCluster vectors regardless of stream
  * length. The arrival-order horizon matches StreamingCurate: under
  * out-of-order arrival first-wins may keep a higher-id copy batch
  * would drop — batch re-audit closes it.
  *
  * Replay idempotence: each ADMITTED member's emitted verdict is stored
  * with it in state and returned verbatim on redelivery — recomputing
  * would let a lower-id member that arrived AFTER the first delivery
  * flip a replayed keep into a dup. Non-admitted arrivals (possible
  * only once the cluster is saturated, i.e. the member set is frozen)
  * recompute against that frozen set, which is equally deterministic.
  */
object StreamingSemanticDedup {

  /** `FloatDot`'s exact fold: each float widened to double, products
    * accumulated left to right.
    */
  private[streaming] def dotD(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** Spark `round(x, 4)` on DoubleType: `BigDecimal.valueOf` (i.e. the
    * double's canonical decimal string), HALF_UP.
    */
  private[streaming] def round4(v: Double): Double =
    if (v.isNaN || v.isInfinite) v
    else java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Freeze the quantizer: q70's centroid rows (vec_id in
    * [CentBase, CentBase+NCent)) collected with their norms — a
    * model-sized broadcast, the same rows batch `semanticDupOf`
    * cross-joins.
    */
  def frozenCentroids(embeddings: DataFrame)
      : Broadcast[Seq[(Long, Array[Float], Double)]] = {
    import embeddings.sparkSession.implicits._
    val cents = embeddings
      .filter(col("vec_id") >= Similarity.CentBase &&
        col("vec_id") < Similarity.CentBase + Similarity.NCent)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .collect().toSeq.sortBy(_._1)
      .map { case (id, emb) => (id, emb, math.sqrt(dotD(emb, emb))) }
    // an empty model would silently funnel EVERY vector into one
    // pseudo-cluster (bestCid -1) and cross-compare unrelated vectors
    // — verdicts batch q70 never produces. Fail fast instead (r08
    // review): the caller pointed at the wrong relation or filtered
    // the seed range away
    require(cents.nonEmpty,
      s"no centroid rows in [${Similarity.CentBase}, " +
        s"${Similarity.CentBase + Similarity.NCent}) — wrong embeddings relation?")
    embeddings.sparkSession.sparkContext.broadcast(cents)
  }

  val DefaultMaxCluster = 100000

  /** The full streamed verdict pass over a streaming (or batch)
    * `(vec_id, embedding)` relation: stateless nearest-centroid assign
    * in one mapPartitions, then one `flatMapGroupsWithState` per-cluster
    * membership index. Within a micro-batch a cluster resolves in
    * vec_id order (batch q70's min-id semantics); a replayed member
    * re-emits its original verdict (membership is id-checked, so
    * at-least-once sources cannot double-insert).
    */
  /** `stateTtl`: StreamingDedup's contract — a cluster idle that long
    * evicts its membership index, bounding state by the ACTIVE working
    * set on unbounded streams; the dedup horizon becomes the TTL, which
    * batch q70 re-audit closes.
    */
  def verdicts(vecs: DataFrame,
      cents: Broadcast[Seq[(Long, Array[Float], Double)]],
      maxCluster: Int = DefaultMaxCluster,
      stateTtl: Option[java.time.Duration] = None): Dataset[SemVerdict] = {
    import vecs.sparkSession.implicits._
    val timeoutKind = stateTtl.fold(GroupStateTimeout.NoTimeout())(_ =>
      GroupStateTimeout.ProcessingTimeTimeout())
    val assigned = vecs.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = cents.value
        it.map { case (id, emb) =>
          val nrm = math.sqrt(dotD(emb, emb))
          var bestCid = -1L
          var best = 0.0
          var first = true
          cs.foreach { case (cid, cemb, cnrm) =>
            val c = round4(dotD(emb, cemb) / (nrm * cnrm))
            // ascending-cid iteration + strictly-greater keeps the
            // lowest cid on ties — centroidRanks' (ccos DESC, cid)
            if (first || java.lang.Double.compare(c, best) > 0) {
              best = c; bestCid = cid; first = false
            }
          }
          (bestCid, id, emb, nrm)
        }
      }
    assigned.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, Array[Float], Double, Long)],
        SemVerdict](OutputMode.Append(), timeoutKind) {
        (cid, chunk, state) =>
          if (state.hasTimedOut) {
            state.remove() // idle cluster: evict its index, emit nothing
            Iterator.empty
          } else {
          // buffer + verdict map per invocation: the τ-compare is
          // inherently O(cluster) per arrival (same cost class as the
          // batch per-cluster pair join), but append and id-membership
          // must not add another O(n) on top (Seq :+ / exists are
          // linear). Each member carries its EMITTED dup_of so a
          // replayed id returns its original verdict, not a recompute.
          val members = scala.collection.mutable.ArrayBuffer
            .from(state.getOption.getOrElse(Seq.empty))
          val verdictOf = scala.collection.mutable.Map
            .from(members.map(m => m._1 -> m._4))
          val out = chunk.toSeq.sortBy(_._2).map { case (_, id, emb, nrm) =>
            verdictOf.get(id) match {
              case Some(stored) => SemVerdict(id, cid, stored) // replay
              case None =>
                var dupOf = -1L
                members.foreach { case (mid, memb, mnrm, _) =>
                  // mid < id: batch q70 only ever points at a LOWER id
                  if (mid < id &&
                    round4(dotD(emb, memb) / (nrm * mnrm)) >= Similarity.SemTau &&
                    (dupOf == -1L || mid < dupOf)) dupOf = mid
                }
                if (members.size < maxCluster) {
                  members += ((id, emb, nrm, dupOf)); verdictOf(id) = dupOf
                }
                SemVerdict(id, cid, dupOf)
            }
          }
          state.update(members.toSeq)
          stateTtl.foreach(t => state.setTimeoutDuration(t.toMillis))
          out.iterator
          }
      }
  }
}
