package graft

import org.apache.spark.sql.DataFrame
import graft.queries.TextAnalysis

/** Behavioral gates for the q117 PII redactor on GENUINE PII fixtures —
  * the corpus hash gate proves cross-engine parity on the constructed
  * contact tails, but the redaction regexes themselves are the real
  * ones and their semantics (multi-match, case-insensitive emails, the
  * word-boundary fence, the email→ip→phone cascade, idempotence) need
  * real-looking text to exercise.
  */
class PiiSpec extends SparkSpec {

  private def redact(rows: Seq[(Long, String)]
      ): Map[Long, (Long, Long, Long, String)] = {
    val sp = spark
    import sp.implicits._
    TextAnalysis.piiRedact(rows.toDF("doc_id", "page"))
      .select("doc_id", "n_email", "n_ip", "n_phone", "red")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
  }

  test("emails: multi-match, mixed case, plus-addressing, multi-label domains") {
    val out = redact(Seq(
      (1L, "reach john.doe+test@example.co.uk or JANE@FOO.COM today"),
      (2L, "no contact info here at all")))
    assert(out(1L) === ((2L, 0L, 0L,
      "reach [EMAIL] or [EMAIL] today")))
    assert(out(2L) === ((0L, 0L, 0L, "no contact info here at all")))
  }

  test("phones: standard form redacts; digit-glued serials and short forms survive the boundary fence") {
    val out = redact(Seq(
      (1L, "call 555-123-4567."),
      (2L, "sn 9555-123-4567 is not a phone"),
      (3L, "ref 555-12-34567 malformed")))
    assert(out(1L) === ((0L, 0L, 1L, "call [PHONE].")))
    assert(out(2L) === ((0L, 0L, 0L, "sn 9555-123-4567 is not a phone")))
    assert(out(3L) === ((0L, 0L, 0L, "ref 555-12-34567 malformed")))
  }

  test("ips: dotted quads redact; a 5-part version string loses its quad prefix (documented over-match)") {
    val out = redact(Seq(
      (1L, "server at 192.168.1.10 and 8.8.8.8"),
      (2L, "version 1.2.3.4.5 string")))
    assert(out(1L) === ((0L, 2L, 0L, "server at [IP] and [IP]")))
    // the plain dotted-quad regex takes the first four octets of a
    // longer dotted run — the standard limitation of regex-level IP
    // scrubbing, pinned here so a future "fix" is a conscious choice
    assert(out(2L) === ((0L, 1L, 0L, "version [IP].5 string")))
  }

  test("cascade: a dotted-quad inside an email domain is consumed by the email mask, never double-counted") {
    val out = redact(Seq((1L, "bounce bob@10.0.0.1.example.com end")))
    assert(out(1L) === ((1L, 0L, 0L, "bounce [EMAIL] end")))
  }

  test("streaming: the redactor converges with batch q117 exactly under chunked delivery; a null page redacts to empty") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, length, md5}
    val sf = "/root/testdata/sf0.001"
    val batch = SparkEntry.queries("q117_pii_redact")(sp, sf)
      .as[(Long, Long, Long, Long, String, Long)].collect().toSet
    assert(batch.nonEmpty)
    // stream the same docs batch q117 reads; the page construction +
    // redactor are the stateless streaming surface
    val all = Tables.documents(sp, sf)
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, String, String)]
    val pageCol = graft.queries.TextAnalysis.piiPage(
      col("doc_id"), col("source"), col("text"))
    val q = graft.queries.TextAnalysis.piiRedact(
        mem.toDF().toDF("doc_id", "text", "source")
          .select(col("doc_id"), pageCol.as("page")))
      .select(col("doc_id"), col("n_email"), col("n_ip"), col("n_phone"),
        md5(col("red")).as("red_md5"),
        length(col("red")).cast("long").as("red_len"))
      .writeStream.format("memory").queryName("pii_stream")
      .outputMode("append").start()
    try {
      all.grouped((all.length + 2) / 3).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      mem.addData(Seq((999998L, null, "srcNEW"))) // null-text defense
      q.processAllAvailable()
      val streamed = sp.table("pii_stream")
        .as[(Long, Long, Long, Long, String, Long)].collect()
      assert(streamed.filter(_._1 < 999998L).toSet === batch,
        "streamed redaction diverged from batch q117")
      val nullDoc = streamed.find(_._1 == 999998L).get
      assert((nullDoc._2, nullDoc._3, nullDoc._4) === ((0L, 0L, 0L)))
    } finally q.stop()
  }

  test("fuzz: the column pipeline equals a pure-JVM reference cascade on 200 adversarial pages; masks never create matches") {
    import java.util.regex.Pattern
    val email = Pattern.compile(TextAnalysis.PiiEmailRe)
    val ip = Pattern.compile(TextAnalysis.PiiIpRe)
    val phone = Pattern.compile(TextAnalysis.PiiPhoneRe)
    def ref(page: String): (Long, Long, Long, String) = {
      def count(p: Pattern, s: String): Long = {
        val m = p.matcher(s); var c = 0L; while (m.find()) c += 1; c
      }
      val ne = count(email, page)
      val t1 = email.matcher(page).replaceAll("[EMAIL]")
      val ni = count(ip, t1)
      val t2 = ip.matcher(t1).replaceAll("[IP]")
      val np = count(phone, t2)
      (ne, ni, np, phone.matcher(t2).replaceAll("[PHONE]"))
    }
    // adversarial generator: PII fragments, near-misses, boundary
    // traps, glued digits — everything EXCEPT the mask tokens
    val rnd = new scala.util.Random(42)
    val frags = Seq(
      "a@b.io", "X.Y@Mail.ORG", "user+tag@host.co.uk", "no@tld",
      "@lead", "trail@", "a@b@c.io", "555-123-4567", "9555-123-4567",
      "555-12-4567", "1-555-123-4567", "10.0.0.1", "999.1.2.3",
      "1.2.3.4.5", "v1.2", "..", "-", "a-b-c", "123", "word",
      "0.0.0.0", "255.255.255.255", "x 1.2.3.4x", "dot.word", "a_b%c")
    val pages = (0 until 200).map { _ =>
      (0 until (1 + rnd.nextInt(8)))
        .map(_ => frags(rnd.nextInt(frags.size)))
        .mkString(rnd.nextInt(3) match {
          case 0 => " "
          case 1 => ""
          case _ => ", "
        })
    }
    val out = redact(pages.zipWithIndex.map { case (p, i) => (i.toLong, p) })
    pages.zipWithIndex.foreach { case (p, i) =>
      val (ne, ni, np, red) = ref(p)
      assert(out(i.toLong) === ((ne, ni, np, red)),
        s"engine diverged from the JVM reference on page <$p>")
      // count/replace consistency: each count equals the masks the
      // replace actually inserted (inputs never contain mask tokens)
      def occ(tok: String) =
        red.sliding(tok.length).count(_ == tok).toLong
      assert(occ("[EMAIL]") === ne && occ("[IP]") === ni &&
        occ("[PHONE]") === np, s"count/mask drift on <$p>")
    }
    // masks cannot create new matches → redaction is idempotent on
    // every fuzzed page
    val again = redact(pages.zipWithIndex.map { case (p, i) =>
      (i.toLong, ref(p)._4)
    })
    pages.indices.foreach { i =>
      assert(again(i.toLong) === ((0L, 0L, 0L, ref(pages(i))._4)),
        s"redaction not idempotent on page $i")
    }
  }

  test("idempotence: redacting already-redacted text is a no-op with zero counts") {
    val once = redact(Seq(
      (1L, "mail a@b.io call 555-123-4567 from 10.0.0.1")))(1L)
    assert(once === ((1L, 1L, 1L, "mail [EMAIL] call [PHONE] from [IP]")))
    val twice = redact(Seq((1L, once._4)))(1L)
    assert(twice === ((0L, 0L, 0L, once._4)))
  }
}
