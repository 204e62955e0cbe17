package graft

import org.apache.spark.sql.DataFrame
import graft.queries.Dedup

/** Behavioral gates for q127 containment/engulfment detection — the
  * semantics the value-hash oracle cannot stage: a true engulfment is
  * found at containment 1.0 (the rarest-probe recall guarantee), a
  * below-τ overlap is rejected, equal gram sets are exact-dup
  * territory and never reported, and the df-cap recall trade behaves
  * as stated (unprobeable ⇒ absent, never an all-pairs fallback).
  */
class ContainmentSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  private def report(rows: Seq[(Long, String)])
      : Seq[(Long, Long, Long, Long, Double)] =
    Dedup.containmentReport(docsDf(rows))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSeq

  private def words(pfx: String, n: Int): String =
    (0 until n).map(i => s"$pfx$i").mkString(" ")

  test("an exact snippet is engulfed at containment 1.0; an unrelated doc is not flagged") {
    val out = report(Seq(
      1L -> words("w", 40), // 33 distinct 8-grams
      2L -> words("w", 12), // 5 grams, all inside doc 1
      3L -> words("u", 40)))
    assert(out == Seq((2L, 1L, 5L, 5L, 1.0)), out.mkString(";"))
  }

  test("below-τ overlap is rejected by the exact confirm") {
    // doc 2 = 12 container words then 10 foreign words: of its 15
    // grams only the 5 fully inside w0..w11 are shared — 5/15 ≪ τ
    val out = report(Seq(
      1L -> words("w", 40),
      2L -> (words("w", 12) + " " + words("z", 10))))
    assert(out.isEmpty, out.mkString(";"))
  }

  test("equal gram sets are exact-dup territory, never engulfment") {
    val out = report(Seq(1L -> words("w", 40), 2L -> words("w", 40)))
    assert(out.isEmpty, out.mkString(";"))
  }

  test("df-cap recall trade: an unprobeable doc is absent, never an all-pairs fallback") {
    val sp = spark
    val rows = Seq(1L -> words("w", 40), 2L -> words("w", 12))
    // every gram of doc 2 also lives in doc 1 ⇒ df ≥ 2 for all its
    // probes ⇒ cap 1 makes it unprobeable
    sp.conf.set("graft.contain.dfCap", "1")
    val capped = try report(rows)
    finally sp.conf.unset("graft.contain.dfCap")
    assert(capped.isEmpty, capped.mkString(";"))
    assert(report(rows).nonEmpty) // default cap: found again
  }

  test("every constructed corpus snippet is reported inside its parent at containment 1.0") {
    val sp = spark
    import sp.implicits._
    val docs = Tables.documents(sp, sf)
    val expected = docs
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .where(org.apache.spark.sql.functions.expr(
        "doc_id % 9 = 2 AND size(regexp_extract_all(text, '\\\\S+', 0)) >= 30"))
      .as[Long].collect().toSet
    assert(expected.nonEmpty, "fixture must construct snippets")
    val got = SparkEntry.queries("q127_containment")(sp, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    expected.foreach { p =>
      val row = got.find(r => r._1 == p + Dedup.SnipOff && r._2 == p)
      assert(row.exists(_._5 == 1.0),
        s"snippet of $p missing or partial: ${row.orElse(Some("absent"))}")
    }
  }
}
