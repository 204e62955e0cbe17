package graft

import org.apache.spark.sql.DataFrame
import graft.queries.TextAnalysis

/** Behavioral gates for q118 keep-first paragraph dedup — the policy
  * decisions the corpus hash gate cannot stage: the winner is the
  * GLOBAL minimum (doc_id, line_idx) occurrence (across sources, which
  * q114's per-source census would never touch), within-doc repeats keep
  * only their first copy, a fully-shadowed document reduces to the
  * empty page, and exactly one copy of every distinct line survives
  * corpus-wide. A reference implementation over the same constructed
  * page model checks md5-exact reconstruction for the whole fixture.
  */
class ParagraphDedupSpec extends SparkSpec {

  private val W = TextAnalysis.BoilerW

  private def docsDf(rows: Seq[(Long, String, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  private def dedup(rows: Seq[(Long, String, String)]
      ): Map[Long, (Long, Long, String, Long)] =
    TextAnalysis.paragraphDedup(docsDf(rows))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5))))
      .toMap

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The constructed page with line indices, mirroring pageLines. */
  private def expectedPage(id: Long, src: String, text: String
      ): Seq[(Long, String)] = {
    val ws = "\\S+".r.findAllIn(text).toArray
    val body =
      if (ws.isEmpty) Seq("")
      else ws.grouped(W).map(_.mkString(" ")).toSeq
    Seq(0L -> s"nav $src menu home about contact") ++
      body.zipWithIndex.map { case (l, i) => (i + 1L) -> l } ++
      (if (id % 17 == 0)
        Seq(999999L -> s"promo $src special offer today only") else Nil) ++
      (if (id % 3 != 0)
        Seq(1000000L -> s"footer $src copyright terms privacy") else Nil)
  }

  /** Keep-first reference over the same page model. */
  private def reference(rows: Seq[(Long, String, String)]
      ): Map[Long, (Long, Long, String, Long)] = {
    val all = rows.sortBy(_._1).flatMap { case (id, text, src) =>
      expectedPage(id, src, text).map { case (i, l) => (id, i, l) }
    }.sortBy(t => (t._1, t._2))
    val seen = scala.collection.mutable.Set[String]()
    val keptFlag = all.map { case (id, i, l) => ((id, i), seen.add(l)) }.toMap
    rows.map { case (id, text, src) =>
      val page = expectedPage(id, src, text)
      val kept = page.collect { case (i, l) if keptFlag((id, i)) => l }
      val keptText = kept.mkString(" ")
      id -> ((page.size.toLong, (page.size - kept.size).toLong,
        md5Hex(keptText), keptText.length.toLong))
    }.toMap
  }

  private def uniqueText(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("mixed fixture matches the keep-first reference md5-exactly") {
    val shared = uniqueText("dup", W) // one full shared body line
    val rows = Seq(
      (1L, s"$shared ${uniqueText("a", W)}", "sA"),
      (2L, s"${uniqueText("b", W)} $shared", "sB"), // cross-source repeat
      (4L, uniqueText("c", W), "sA"),
      (5L, s"$shared $shared", "sB"), // within-doc repeat of a dup
      (8L, uniqueText("e", 3), "sC"))
    assert(dedup(rows) === reference(rows))
  }

  test("cross-source duplicate drops at the later doc — the policy q114's per-source census cannot express") {
    val shared = uniqueText("x", W)
    val rows = Seq(
      (1L, s"$shared ${uniqueText("a", W)}", "sA"),
      (2L, s"$shared ${uniqueText("b", W)}", "sB"))
    val out = dedup(rows)
    // doc 1 keeps everything; doc 2 loses exactly the shared line
    assert(out(1L)._2 === 0L)
    assert(out(2L)._2 === 1L)
    assert(out === reference(rows))
  }

  test("within-doc repeat keeps only its first occurrence") {
    val l = uniqueText("r", W)
    val rows = Seq((1L, s"$l $l $l", "sA"))
    val out = dedup(rows)
    assert(out(1L)._1 === 5L) // header + 3 body + footer
    assert(out(1L)._2 === 2L)
    assert(out === reference(rows))
  }

  test("a fully-shadowed document reduces to the empty page") {
    val body = uniqueText("s", W)
    // docs 4 and 7: same source (same header+footer text), same body,
    // both %3!=0 (footer present), neither %17==0 (no promo) — doc 7
    // is line-for-line shadowed by doc 4
    val rows = Seq((4L, body, "sA"), (7L, body, "sA"))
    val out = dedup(rows)
    assert(out(4L)._2 === 0L)
    assert(out(7L) === ((3L, 3L, md5Hex(""), 0L)))
  }

  test("exactly one copy of every distinct line survives corpus-wide") {
    val shared = uniqueText("z", W)
    val rows = Seq(
      (1L, s"$shared ${uniqueText("a", W)}", "sA"),
      (2L, s"$shared ${uniqueText("b", W)}", "sB"),
      (4L, shared, "sA"),
      (5L, shared, "sB"))
    val out = dedup(rows)
    val keptTotal = out.values.map(v => v._1 - v._2).sum
    val distinctLines = rows.flatMap { case (id, t, s) =>
      expectedPage(id, s, t).map(_._2)
    }.distinct.size.toLong
    assert(keptTotal === distinctLines)
  }
}
