package graft.queries

/** Per-JVM memo of MODEL-SIZED training outputs, keyed by (kind,
  * dataset dir) — the fix for the r06 verdict's duplicated-training
  * finding: a certificate entry (q85/q86/q96) re-ran its training
  * entry's full loop (q59 k-means, q73 gradient descent), so one
  * catalog pass paid each training twice (~9.5 s of BENCH_r06).
  *
  * Contract:
  *  - TRAINING entries always retrain and `put` (their cost stays
  *    honest in the bench — every rep pays the full loop — and the
  *    cache can never serve a stale model after a code change);
  *  - CERTIFICATE entries `getOrCompute`: they consume the model the
  *    training entry just produced when one ran earlier in the same
  *    session (Verify/Bench run the whole catalog in one JVM), and
  *    train for themselves when probed in isolation
  *    (`SPARK_GRAFT_ONLY=q85`) — identical results either way because
  *    training is deterministic.
  *
  * Only driver-side VALUES are cached (centroid arrays, weight
  * vectors, loss traces — all bounded by model size, never corpus
  * rows), deliberately NOT DataFrames: Bench's per-rep settle()
  * unpersists every localCheckpoint-pinned RDD, which would invalidate
  * any cached plan, and a cached value survives that by construction.
  */
object ModelCache {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), AnyRef]()

  /** Refresh: training entries call this after every (re)train. */
  def put[T <: AnyRef](kind: String, d: String, v: T): T = {
    cache.put((kind, d), v)
    v
  }

  /** Consume: certificate entries reuse the last trained model for
    * this dataset, or train one if none exists yet this session.
    */
  def getOrCompute[T <: AnyRef](kind: String, d: String)(f: => T): T = {
    val k = (kind, d)
    val hit = cache.get(k)
    if (hit != null) hit.asInstanceOf[T] else put(kind, d, f)
  }
}
