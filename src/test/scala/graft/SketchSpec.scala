package graft

import org.apache.spark.sql.functions._

/** Quality gate for the sketch-based corpus profile (q56).
  *
  * Sketch outputs are implementation-defined, so q56 is a rows-only
  * catalog entry — this spec is what makes it falsifiable: every
  * HyperLogLog++ estimate must land within its configured relative
  * standard deviation (2%, asserted at a generous 3× = 6%) of the exact
  * distinct count on the same data, and the approximate median must be
  * an actual data value between the exact 40th and 60th percentiles.
  */
class SketchSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q56 HLL estimates land within 3x the configured rsd of exact counts") {
    val got = SparkEntry.queries("q56_sketch_profile")(spark, sf).collect()
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf)
    val exactVocab = docs
      .select(col("lang"),
        explode(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("w"))
      .groupBy(col("lang")).agg(countDistinct(col("w")).as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactDocs = docs.groupBy(col("lang"))
      .agg(countDistinct(md5(col("text"))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      val lang = r.getString(r.fieldIndex("lang"))
      val av = r.getLong(r.fieldIndex("approx_vocab"))
      val ad = r.getLong(r.fieldIndex("approx_distinct_docs"))
      val ev = exactVocab(lang)
      val ed = exactDocs(lang)
      assert(math.abs(av - ev).toDouble / ev <= 0.06,
        s"$lang vocab estimate $av vs exact $ev drifts beyond 6%")
      assert(math.abs(ad - ed).toDouble / ed <= 0.06,
        s"$lang distinct-doc estimate $ad vs exact $ed drifts beyond 6%")
    }
  }

  test("q56 median sketch lands between the exact 40th and 60th percentiles") {
    val got = SparkEntry.queries("q56_sketch_profile")(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    val bounds = docs.groupBy(col("lang"))
      .agg(expr("percentile(n_chars, 0.4)").as("lo"),
        expr("percentile(n_chars, 0.6)").as("hi"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    got.foreach { r =>
      val lang = r.getString(r.fieldIndex("lang"))
      val p50 = r.getLong(r.fieldIndex("p50_chars"))
      val (lo, hi) = bounds(lang)
      assert(p50 >= lo - 1 && p50 <= hi + 1,
        s"$lang p50 sketch $p50 outside exact 40-60pct band [$lo, $hi]")
    }
  }
}
