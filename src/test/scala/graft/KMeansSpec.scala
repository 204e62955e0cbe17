package graft

/** Quality gate for in-engine k-means training (q59).
  *
  * The entry is rows-only (float mean aggregation is partial-order-
  * dependent in the low bits, so no cross-engine hash can pin it); this
  * spec pins what matters instead: Lloyd iterations must strictly
  * improve the quantizer, every vector must be assigned exactly once,
  * and the trained centroids must beat the seeded centroids that
  * q37/q57 use for oracle determinism — training that does not improve
  * on its init is a no-op wearing a loop.
  */
class KMeansSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q59 spherical rounds strictly decrease the objective and beat the seeded init") {
    val (assign, _, wcss) = graft.queries.Similarity.kmeans(spark, sf)
    assert(wcss.size == 4, s"expected init + 3 rounds, got $wcss")
    wcss.sliding(2).foreach { case Seq(prev, next) =>
      assert(next < prev,
        s"objective must strictly decrease across rounds: $wcss")
    }
    // trained quantizer must clearly beat the seeded one (round 0 IS the
    // seeded assignment q37/q57 use)
    assert(wcss.last < wcss.head * 0.95,
      s"training bought <5% over the seeded centroids: $wcss")
    info(f"objective (sum 1-cos) per round: ${wcss.map(w => f"$w%.1f").mkString(" -> ")}")
    val n = assign.count()
    val total = Tables.embeddings(spark, sf).count()
    assert(n == total, s"every vector assigned exactly once: $n vs $total")
  }

  test("q59 catalog entry emits one summary row per non-empty cluster") {
    val rows = SparkEntry.queries("q59_kmeans_train")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 8)
    val total = rows.map(_.getLong(rows.head.fieldIndex("n_vectors"))).sum
    assert(total == Tables.embeddings(spark, sf).count())
  }
}
