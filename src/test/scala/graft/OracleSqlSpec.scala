package graft

/** Generated-oracle sanity — the init-cycle regression class: q108's
  * chunk entries created a TextAnalysis ↔ Selection object-init cycle,
  * and a plain-val constant read mid-init returned 0, generating a
  * q75 oracle with ZERO BPE merge layers and a dangling `UNION ALL`
  * (DuckDB ParserException at the driver's correctness gate). These
  * checks force the full catalog's oracle strings and pin the
  * interpolated shapes, so a reintroduced cycle fails here instead of
  * in CORRECTNESS_r{N}.
  */
class OracleSqlSpec extends org.scalatest.funsuite.AnyFunSuite {

  private lazy val oracles = SparkEntry.oracleSql

  test("no oracle contains a dangling set operator or an empty interpolation") {
    for ((name, sql) <- oracles) {
      assert(!sql.matches("(?s).*UNION ALL\\s*\\).*"),
        s"$name: dangling UNION ALL — a constant interpolated as empty")
      assert(!sql.contains("% 0") && !sql.contains("// 0"),
        s"$name: a modulus/divisor interpolated as 0")
    }
  }

  test("q75's oracle carries all BpeMerges layers and a non-empty product leg") {
    val sql = oracles("q75_train_sequences")
    val m = graft.queries.TextAnalysis.BpeMerges
    assert(m > 0)
    assert(sql.contains(s"FROM v$m"),
      s"q75 oracle must read the final merge layer v$m")
    assert(sql.contains("UNION ALL SELECT l || r AS tok FROM b1"),
      "q75 oracle lost its merge-product token leg")
  }

  test("q119's oracle carries all eight query-term pivot legs and the gram fence") {
    val sql = oracles("q119_hard_negatives")
    for (t <- graft.queries.TextAnalysis.HnTerms) {
      assert(sql.contains(s"AS s_$t"), s"q119 oracle lost the s_$t pivot leg")
      assert(sql.contains(s"AS q_$t"), s"q119 oracle lost the q_$t flag leg")
    }
    // the cross-module gram expression must have interpolated a real
    // 8-gram transform, not an empty CASE arm
    assert(sql.contains("ws[i + 7]"),
      "q119 oracle lost the 8-gram leak fence (cross-module init cycle?)")
  }

  test("q120's oracle reads the final merge layer") {
    val sql = oracles("q120_tokenizer_fertility")
    assert(sql.contains(s"FROM v${graft.queries.TextAnalysis.BpeMerges}"),
      "q120 oracle must encode with the final trained layer")
  }

  test("q105/q108 oracles interpolate the real chunk width and stride") {
    val w = graft.queries.Selection.ChunkW
    val st = graft.queries.Selection.ChunkS
    assert(w > 0 && st > 0 && st < w)
    for (name <- Seq("q105_chunk_windows", "q108_chunk_retrieval")) {
      val sql = oracles(name)
      assert(sql.contains(s", $st)"),
        s"$name oracle lost the stride constant")
      assert(sql.contains(s"$w"), s"$name oracle lost the width constant")
    }
  }
}
