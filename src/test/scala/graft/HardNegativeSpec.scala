package graft

import org.apache.spark.sql.DataFrame
import graft.queries.TextAnalysis

/** Behavioral gates for q119 hard-negative mining — the DPR-policy
  * decisions the corpus hash gate cannot stage: a training document
  * that LEAKS an eval 8-gram must never be served as a negative even
  * when it would top the BM25 ranking, query docs without query-
  * vocabulary terms yield no rows, scores rank strictly, and ranks are
  * contiguous from 1.
  */
class HardNegativeSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.map { case (id, t) => (id, t, "sA") }.toDF("doc_id", "text", "source")
  }

  private def mine(rows: Seq[(Long, String)]): Seq[(Long, Int, Long, Double)] =
    TextAnalysis.hardNegatives(docsDf(rows))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  // eval ids ≡ 3 (mod 10); doc 3's first 8 words are the leaked gram
  private val evalText =
    "hash join merge alpha beta gamma delta epsilon zeta eta"
  private val leakedGram =
    "hash join merge alpha beta gamma delta epsilon"

  test("a leaked training doc is excluded even when it would top the ranking") {
    val rows = Seq(
      3L -> evalText,
      // doc 5 repeats the eval 8-gram AND is saturated with query
      // terms — without the leak fence it would be rank 1
      5L -> s"$leakedGram hash hash hash join join join merge merge",
      1L -> "hash hash hash join join merge",
      2L -> "hash join other words here",
      4L -> "merge",
      6L -> "nothing relevant at all")
    val out = mine(rows)
    val for3 = out.filter(_._1 == 3L)
    assert(for3.nonEmpty)
    assert(!for3.exists(_._3 == 5L), s"leaked doc served as negative: $out")
    assert(for3.map(_._3).toSet === Set(1L, 2L, 4L))
    // saturated doc 1 outranks the rest; scores strictly decrease;
    // ranks contiguous from 1
    assert(for3.minBy(_._2)._3 === 1L)
    assert(for3.sortBy(_._2).map(_._4).sliding(2).forall(p =>
      p.size < 2 || p(0) > p(1)))
    assert(for3.map(_._2).sorted === (1 to for3.size))
  }

  test("an eval doc without query-vocabulary terms yields no rows; zero-score docs are never served") {
    val rows = Seq(
      3L -> evalText,
      13L -> "alpha beta gamma nothing from the query vocabulary",
      1L -> "hash join",
      6L -> "no relevant terms")
    val out = mine(rows)
    assert(out.map(_._1).toSet === Set(3L))
    assert(!out.exists(_._3 == 6L))
  }

  test("at most HnK negatives per eval doc") {
    // term presence VARIES across train docs — if every doc carried
    // every term, the integer idf (N − df) would zero all scores
    val rows = (3L -> evalText) +:
      (1L to 20L).filter(_ % 10 != 3).map { i =>
        val t = new StringBuilder(s"filler$i pad$i")
        if (i <= 9) t ++= " hash"
        if (i % 3 == 0) t ++= " join"
        if (i % 4 == 0) t ++= " merge"
        i -> t.result()
      }
    val out = mine(rows)
    assert(out.count(_._1 == 3L) === TextAnalysis.HnK)
  }

  test("eval-shard size guard refuses loudly above the bound (the broadcast-premise contract)") {
    // the miner's eval-side relations broadcast and its scorer is a
    // broadcast nested loop — the design premise is a benchmark-SIZED
    // eval shard, and above the bound the correct behavior is a
    // refusal naming the Bloom fallback, never a driver OOM
    // two term-free train docs keep the integer idf (N − df) positive
    val rows = Seq(3L -> evalText, 13L -> evalText, 1L -> "hash join",
      2L -> "plain filler words", 4L -> "more filler here")
    val sp = spark
    sp.conf.set("graft.hn.maxEvalDocs", "1")
    val e = try intercept[IllegalArgumentException](mine(rows))
    finally sp.conf.unset("graft.hn.maxEvalDocs")
    assert(e.getMessage.contains("maxEvalDocs") &&
      e.getMessage.contains("Bloom"), e.getMessage)
    // at the default bound the same input mines normally
    assert(mine(rows).nonEmpty)
  }
}
