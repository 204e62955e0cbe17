package graft

import org.apache.spark.sql.DataFrame
import graft.queries.Similarity

/** Behavioral gates for q121 truncation-dimension evaluation — the
  * policy facts the corpus hash gate cannot stage: truncating at the
  * FULL dimension is the identity (overlap = K, every top-1 survives),
  * and a constructed corpus where the prefix dimensions invert the
  * ranking is reported as the flip it is.
  */
class MatryoshkaSpec extends SparkSpec {

  private def embDf(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("vec_id", "embedding").withColumn("label",
      org.apache.spark.sql.functions.lit(0))
  }

  test("truncation at the full dimension is the identity: overlap = K, top-1 always survives") {
    val out = Similarity.mrlEval(
      Tables.embeddings(spark, "/root/testdata/sf0.001"), 64)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) === 10L, s"full-dim overlap must be K: $r")
      assert(r.getBoolean(4), s"full-dim top-1 must survive: $r")
    }
  }

  test("a prefix that inverts the ranking is reported as a flip") {
    // query 0 = (1, 0, 0, 0). Candidate 10 is the FULL-cosine winner
    // (nearly parallel once all dims count); candidate 11 wins in the
    // 2-dim prefix (its tail drags its full cosine down).
    val rows = Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      10L -> Seq(0.8f, 0f, 0.1f, 0f), // full cos ≈ 0.992; prefix cos = 1.0 (tie-broken by id)
      11L -> Seq(0.9f, 0f, 3f, 0f), // full cos ≈ 0.287; prefix cos = 1.0
      12L -> Seq(0.1f, 0.9f, 0f, 0f)) // far in both
    // prefix(2): cand 10 = (0.8, 0) → cos 1.0; cand 11 = (0.9, 0) →
    // cos 1.0; tie → cand_id order puts 10 first in BOTH rankings, so
    // flip the tie by making 10's prefix slightly off-axis
    val rows2 = rows.map {
      case (10L, _) => 10L -> Seq(0.8f, 0.2f, 0.1f, 0f)
      case other => other
    }
    val out = Similarity.mrlEval(embDf(rows2), 2)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val (_, top1Full, top1Trunc, top1Match) = out(0L)
    assert(top1Full === 10L, s"full-dim winner: ${out(0L)}")
    assert(top1Trunc === 11L, s"prefix winner: ${out(0L)}")
    assert(!top1Match)
  }
}
