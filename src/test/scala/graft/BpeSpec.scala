package graft

import graft.queries.TextAnalysis
import org.apache.spark.sql.DataFrame

/** q66 BPE merge training: the textbook merge sequence on a constructed
  * vocabulary, determinism, and monotone vocabulary compression — the
  * rows-only entry's semantic gate (a hash oracle cannot express 16
  * data-dependent iterations).
  */
class BpeSpec extends SparkSpec {

  private def vocabDf(pairs: (String, Long)*): DataFrame = {
    import spark.implicits._
    pairs.toSeq.toDF("w", "freq")
  }

  /** The classic Sennrich et al. example: {low×5, lower×2, newest×6,
    * widest×3}. 'es' (in newest+widest, freq 9) must merge first, then
    * 'es t' (9), then 'est </w>' (9).
    */
  test("textbook merge sequence on the Sennrich vocabulary") {
    val rules = TextAnalysis.bpeTrainOn(
      vocabDf("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L),
      merges = 3)
    assert(rules == Seq(("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L)),
      rules.toString)
  }

  test("training is deterministic run-to-run") {
    val v = vocabDf("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "wide" -> 4L)
    val a = TextAnalysis.bpeTrainOn(v, merges = 6)
    val b = TextAnalysis.bpeTrainOn(v, merges = 6)
    assert(a == b)
    assert(a.size == 6)
  }

  test("each merge strictly shrinks the symbol count of some word") {
    // apply the learned rules in order to the vocab; total symbols
    // (weighted by freq) must strictly decrease at every rank
    val words = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val rules = TextAnalysis.bpeTrainOn(vocabDf(words: _*), merges = 5)
    def applyRule(syms: Seq[String], l: String, r: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += l + r; i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    var vocab: Seq[(Seq[String], Long)] =
      words.map { case (w, f) => (w.map(_.toString).toSeq :+ "</w>", f) }
    var total = vocab.map { case (sy, f) => sy.size * f }.sum
    rules.foreach { case (l, r, _) =>
      vocab = vocab.map { case (sy, f) => (applyRule(sy, l, r), f) }
      val next = vocab.map { case (sy, f) => sy.size * f }.sum
      assert(next < total, s"merge ($l,$r) did not compress")
      total = next
    }
  }

  test("exhausted vocabulary stops early instead of looping") {
    // single-letter words fully merge after one rule each; asking for
    // more merges than pairs exist must terminate with fewer rules
    val rules = TextAnalysis.bpeTrainOn(vocabDf("a" -> 3L, "b" -> 2L), 10)
    assert(rules.size <= 2, rules.toString)
    assert(rules.nonEmpty)
  }

  /** The q71 encoder gate: rank-priority encoding must equal the
    * DEFINITIONAL spelling — replay the merges in training order — for
    * every word of the real corpus vocabulary, and every emitted token
    * must be reachable from characters through the learned rules.
    */
  test("q71: rank-priority encode == replay-merges-in-order, on the real vocabulary") {
    val sp = spark
    import sp.implicits._
    val sf = "/root/testdata/sf0.001"
    val rules = TextAnalysis.bpeTrainOn(TextAnalysis.bpeVocab(sp, sf), 16)
    val rank = rules.zipWithIndex.map { case ((l, r, _), i) => (l, r) -> i }.toMap
    val words = TextAnalysis.bpeVocab(sp, sf)
      .as[(String, Long)].collect().map(_._1)
    assert(words.nonEmpty)
    val products = rules.map { case (l, r, _) => l + r }.toSet
    var someWordCompressed = false
    words.foreach { w =>
      val enc = TextAnalysis.bpeEncode(w, rank)
      val replay = rules.foldLeft(w.map(_.toString) :+ "</w>": Seq[String]) {
        case (sy, (l, r, _)) => TextAnalysis.bpeApplyRule(sy, l, r)
      }
      assert(enc == replay, s"'$w': $enc != $replay")
      // round-trip: tokens concatenate back to the word + terminator
      assert(enc.mkString == w + "</w>", s"'$w' round-trip broke: $enc")
      // every multi-char token is a learned merge product
      enc.filter(t => t.length > 1 && t != "</w>").foreach(t =>
        assert(products.contains(t), s"'$w' emitted unlearned token '$t'"))
      if (enc.length < w.length + 1) someWordCompressed = true
    }
    assert(someWordCompressed, "no word compressed — encoder gate is vacuous")
  }
}
