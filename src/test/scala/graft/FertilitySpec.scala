package graft

/** Consistency gate for q120 tokenizer fertility: the per-language
  * token totals must be exactly the per-document q71 totals
  * re-aggregated — both ride the same trained tokenizer (ModelCache
  * "bpe"), so a drift means the fertility report measures a different
  * encoding than the one the pipeline applies.
  */
class FertilitySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q120 per-language totals re-aggregate q71's per-document totals exactly") {
    val fert = SparkEntry.queries("q120_tokenizer_fertility")(spark, sf)
      .collect()
    val q71Total = SparkEntry.queries("q71_bpe_encode")(spark, sf)
      .groupBy().sum("n_words", "n_bpe_toks")
      .collect()(0)
    assert(fert.map(_.getLong(2)).sum === q71Total.getLong(0)) // n_words
    assert(fert.map(_.getLong(3)).sum === q71Total.getLong(1)) // n_bpe_toks
    // fertility is a ratio of those totals; sanity: strictly > 1
    // (every word encodes to at least its </w> plus one symbol)
    fert.foreach(r => assert(r.getDouble(4) > 1.0))
  }
}
