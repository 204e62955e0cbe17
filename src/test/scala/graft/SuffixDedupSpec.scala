package graft

import graft.queries.SuffixDedup

/** q82/q83 any-length ExactSubstr — the suffix-sort variant's semantics
  * pinned on constructed corpora with KNOWN planted span lengths: runs
  * below MinSpan are invisible, runs in the [MinSpan, ExactK) gap that
  * fixed-k q64 cannot see are found, runs far beyond the MaxSpan suffix
  * window are reported at their EXACT total length, overlapping runs
  * merge, same-document-only repetition does not count, and the cut
  * keeps the canonical copy verbatim while later copies lose exactly
  * the duplicated tokens. (The cross-engine hash gate for the real
  * corpus is the q82/q83 DuckDB oracle; this spec is the constructed
  * ground truth the oracle cannot express.)
  */
class SuffixDedupSpec extends SparkSpec {
  import spark.implicits._

  private def uniq(doc: Int, n: Int): Seq[String] =
    (0 until n).map(i => s"u${doc}x$i")

  private def docsDF(docs: (Long, Seq[String])*) =
    docs.map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")

  private def spans(docs: (Long, Seq[String])*): Seq[(Long, Long, Long)] =
    SuffixDedup.spansOf(docsDF(docs: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private val run5 = (0 until 5).map(i => s"s5w$i")
  private val run6 = (0 until 6).map(i => s"s6w$i")
  private val run7 = (0 until 7).map(i => s"s7w$i")
  private val run40 = (0 until 40).map(i => s"s40w$i")

  test("a 5-token shared run (< MinSpan) is not reported") {
    assert(spans(
      (1L, uniq(1, 8) ++ run5 ++ uniq(1, 108) ++ uniq(11, 8)),
      (2L, uniq(2, 6) ++ run5 ++ uniq(2, 120) ++ uniq(12, 9))).isEmpty)
  }

  test("a 6-token shared run is reported at exact position and length") {
    val got = spans(
      (1L, uniq(1, 8) ++ run6 ++ uniq(1, 100)),
      (2L, uniq(2, 3) ++ run6 ++ uniq(2, 90)))
    assert(got == Seq((1L, 8L, 6L), (2L, 3L, 6L)))
  }

  test("a 7-token run — the fixed-k (k=8) blind spot — is found") {
    // q64's 8-gram anchoring produces NO duplicated 8-gram for a
    // 7-token shared run; the suffix variant reports it exactly
    val got = spans(
      (1L, uniq(1, 5) ++ run7 ++ uniq(1, 80)),
      (2L, uniq(2, 11) ++ run7 ++ uniq(2, 70)))
    assert(got == Seq((1L, 5L, 7L), (2L, 11L, 7L)))
  }

  test("a 40-token run (≫ MaxSpan = 16) is reported at exact length") {
    val got = spans(
      (1L, uniq(1, 4) ++ run40 ++ uniq(1, 50)),
      (2L, uniq(2, 9) ++ run40 ++ uniq(2, 60)))
    assert(got == Seq((1L, 4L, 40L), (2L, 9L, 40L)))
  }

  test("overlapping duplicated runs merge into one maximal span") {
    // doc 1 carries A++B contiguously; doc 2 shares A, doc 3 shares B:
    // doc 1's coverage is one [.,|A|+|B|) span, docs 2/3 see their own
    val a = (0 until 9).map(i => s"ovA$i")
    val b = (0 until 8).map(i => s"ovB$i")
    val got = spans(
      (1L, uniq(1, 3) ++ a ++ b ++ uniq(1, 40)),
      (2L, uniq(2, 7) ++ a ++ uniq(2, 44)),
      (3L, uniq(3, 2) ++ b ++ uniq(3, 52)))
    assert(got == Seq((1L, 3L, 17L), (2L, 7L, 9L), (3L, 2L, 8L)))
  }

  test("same-document-only repetition is not a duplicated span") {
    val r = (0 until 12).map(i => s"selfr$i")
    assert(spans(
      (1L, uniq(1, 5) ++ r ++ uniq(1, 9) ++ r ++ uniq(11, 30)),
      (2L, uniq(2, 64))).isEmpty)
  }

  test("spansOf is deterministic across runs") {
    val corpus = Seq(
      (1L, uniq(1, 4) ++ run40 ++ uniq(1, 33) ++ run6),
      (2L, uniq(2, 9) ++ run40 ++ uniq(2, 41)),
      (3L, run6 ++ uniq(3, 77)))
    assert(spans(corpus: _*) == spans(corpus: _*))
  }

  test("q83 cut keeps the canonical copy verbatim, trims the later copy") {
    val d1 = uniq(1, 5) ++ run7 ++ uniq(1, 60)
    val d2 = uniq(2, 11) ++ run7 ++ uniq(2, 55)
    val got = SuffixDedup.cutsOf(docsDF((1L, d1), (2L, d2)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length == 2)
    val (c1, c2) = (got(0), got(1))
    assert(c1 == ((1L, 0L, d1.mkString(" "))))
    assert(c2._2 == 7L)
    assert(c2._3 == (uniq(2, 11) ++ uniq(2, 55)).mkString(" "))
  }

  test("q82/q83 run the real catalog shape end to end at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val sp = SparkEntry.queries("q82_exactsubstr_any")(spark, sf).collect()
    // spans never overlap within a document and are all ≥ MinSpan
    sp.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      sorted.foreach { case (_, len) => assert(len >= SuffixDedup.MinSpan) }
      sorted.sliding(2).foreach {
        case Array((s1, l1), (s2, _)) => assert(s1 + l1 < s2)
        case _ =>
      }
    }
    val cut = SparkEntry.queries("q83_cut_any_spans")(spark, sf)
    assert(cut.count() == Tables.documents(spark, sf).count())
  }

  test("control-char token cannot wedge between a suffix and its extension (sort-contiguity)") {
    val sp = spark
    import sp.implicits._
    // doc 0 ENDS with the 6-token run; doc 1 continues it; doc 2 plants
    // the adversarial interloper whose 6th token extends "t6" with a
    // char below 0x20 ("t6\u0001y"). Under a \\S+ token class the
    // interloper's suffix sorts BETWEEN the run and its extension and
    // the 6-token LCP is never computed; with control chars as token
    // separators it tokenizes as ... "t6", "y" ... and cannot wedge.
    val run = "t1 t2 t3 t4 t5 t6"
    val docs = Seq(
      (0L, s"alpha beta $run"),
      (1L, s"$run t7 t8 gamma delta"),
      (2L, s"t1 t2 t3 t4 t5 t6\u0001y zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val spans = graft.queries.SuffixDedup.spansOf(docs)
      .select("doc_id", "span_toks").as[(Long, Long)].collect().toSet
    // docs 0 and 1 share the 6-token run; doc 2 ALSO contains it (the
    // control char splits "t6\u0001y" into "t6", "y")
    assert(spans.contains((0L, 6L)) && spans.exists(_._1 == 1L),
      s"cross-document 6-token span missed: $spans")
  }
}
