package graft

import graft.streaming.StreamingLineContain
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming line-containment twin must converge with batch q130
  * exactly when the whole corpus streams through as deltas against the
  * frozen index (chunking-invariant, redelivery-idempotent), detect an
  * arriving quoting page against publish-time containers, and stay
  * silent for novel arrivals — with chrome stripped by the FROZEN
  * census, never counted as quoted content.
  */
class StreamingLineContainSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def words(pfx: String, n: Int): String =
    (0 until n).map(i => s"$pfx$i").mkString(" ")

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Long, Double)] = {
    val sp = spark
    import sp.implicits._
    df.as[(Long, Long, Long, Long, Double)].collect().toSeq
  }

  test("streamed verdicts over the full corpus equal batch q130 under 3-chunk delivery; redelivery is idempotent") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val corpus = graft.queries.TextAnalysis.withQuotes(
      Tables.documents(sp, sf))
    val f = StreamingLineContain.freeze(corpus)
    val all = corpus.as[(Long, String, String)].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, String, String)]
    val out = tmpDir("linecont-stream")
    val q = StreamingLineContain.start(
      mem.toDF().toDF("doc_id", "source", "text"), f, out)
    try {
      val chunks = all.grouped((all.length + 2) / 3).toSeq
      chunks.foreach { c =>
        mem.addData(c.toIndexedSeq)
        q.processAllAvailable()
      }
      // redeliver the first chunk: stateless probe, identical verdicts
      mem.addData(chunks(0).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = sp.read.parquet(out)
      .as[(Long, Long, Long, Long, Double)].collect()
    val got = streamed.toSet
    assert(streamed.length > got.size,
      "redelivery fixture must actually produce duplicate rows")
    val batch = rows(
      SparkEntry.queries("q130_line_containment")(sp, sf)).toSet
    assert(batch.nonEmpty)
    assert(got == batch,
      s"streamed line verdicts diverged from batch q130 (${
        got.diff(batch).size} extra, ${batch.diff(got).size} missing)")
  }

  test("an arriving quoting page is detected against publish-time containers; novel pages and frozen-chrome-only overlap stay silent") {
    val sp = spark
    import sp.implicits._
    // publish-time corpus: enough soup docs that the census strips
    // chrome but not content (ids avoid ≡ 5 mod 9 — no corpus quotes)
    val base = (Seq(1L, 2L, 3L, 4L, 6L).map(i =>
      (i, "s0", words(s"a$i", 40))) :+ ((7L, "s0", words("w", 48))))
      .toDF("doc_id", "source", "text")
    val f = StreamingLineContain.freeze(base)
    // delta: a page quoting doc 7's first two body windows verbatim,
    // and a fully novel page — both carry s0's chrome lines
    val quoting = words("w", 16)
    val delta = Seq((500L, "s0", quoting), (501L, "s0", words("z", 40)))
      .toDF("doc_id", "source", "text")
    val got = rows(StreamingLineContain.probeBatch(delta, f))
    assert(got == Seq((500L, 7L, 2L, 2L, 1.0)), got.mkString(";"))
  }
}
