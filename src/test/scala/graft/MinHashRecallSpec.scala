package graft

/** MinHash/LSH banding quality gate (the q32 analogue of AnnRecallSpec):
  * every TRUE near-duplicate pair — exact n-gram Jaccard ≥ 0.8, from the
  * q31 exact computation — must appear among q32's banding candidates.
  * 16 hashes × 4 bands has capture probability 1-(1-s⁴)⁴ ≈ 0.9995 at
  * s = 0.95, so a miss means broken signature math, not bad luck.
  */
class MinHashRecallSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("banding surfaces every true near-duplicate pair (jaccard >= 0.8)") {
    val truth = SparkEntry.queries("q31_ngram_jaccard")(spark, sf)
      .collect()
      .filter(_.getDouble(2) >= 0.8)
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(truth.nonEmpty, "corpus must contain true near-dups")
    val candidates = SparkEntry.queries("q32_minhash_lsh")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val missed = truth -- candidates
    assert(missed.isEmpty,
      s"banding missed true near-dups: $missed (found ${candidates.size} candidates)")
  }
}
