package graft

import graft.streaming.StreamingPara
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming keep-first paragraph-dedup twin must converge
  * bit-identically with batch q118 under doc_id-order arrival, and its
  * verdicts must be REPLAY-idempotent (a redelivered chunk re-emits
  * the identical verdicts — the StreamingSemanticDedup lesson: the
  * stored keeper answers, never a re-election).
  */
class StreamingParaSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("streamed verdicts rewrite to batch q118 rows under 3-chunk doc_id-order delivery; replay flips nothing") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val docs = Tables.documents(sp, sf)
    val all = docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingPara.verdicts(
        mem.toDF().toDF("doc_id", "text", "source"))
      .writeStream.format("memory").queryName("para_stream")
      .outputMode("append").start()
    try {
      val chunks = all.grouped((all.length + 2) / 3).toSeq
      chunks.foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val verdicts1 = sp.table("para_stream")
        .as[(String, Long, Long, Boolean)].collect().toSet
      // REPLAY the middle chunk (at-least-once redelivery): every
      // re-emitted verdict must equal its first emission — keepers are
      // stored, never re-elected
      mem.addData(chunks(1).toIndexedSeq)
      q.processAllAvailable()
      val verdicts2 = sp.table("para_stream")
        .as[(String, Long, Long, Boolean)].collect()
      assert(verdicts2.toSet == verdicts1,
        "replay emitted a flipped or novel verdict")
      // no occurrence carries two verdicts across the whole sink
      val flips = verdicts2.groupBy(v => (v._1, v._2, v._3))
        .filter(_._2.map(_._4).distinct.size > 1)
      assert(flips.isEmpty, s"verdict flip on replay: ${flips.keys}")
      // the rewrite through the verdict table IS batch q118
      val streamed = StreamingPara.rewrite(
          docs, sp.table("para_stream"))
        .as[(Long, String, Long, Long, String, Long)].collect().toSet
      val batch = SparkEntry.queries("q118_paragraph_dedup")(sp, sf)
        .as[(Long, String, Long, Long, String, Long)].collect().toSet
      assert(batch.nonEmpty)
      assert(streamed == batch,
        "streamed rewrite diverged from batch q118")
      // non-vacuity: the stream actually dropped something
      assert(verdicts1.exists(!_._4), "fixture produced no duplicate line")
    } finally q.stop()
  }

  test("a null-text poison row yields deterministic verdicts and an empty-page rewrite (the pageDocs defense)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingPara.verdicts(
        mem.toDF().toDF("doc_id", "text", "source"))
      .writeStream.format("memory").queryName("para_poison")
      .outputMode("append").start()
    try {
      // two identical docs (the dup), then a null-text row — the line
      // builder must coalesce it, not NPE the deserializer
      mem.addData(Seq((1L, "alpha beta gamma delta", "sA"),
        (2L, "alpha beta gamma delta", "sA"),
        (3L, null, "sA")))
      q.processAllAvailable()
      val vs = sp.table("para_poison")
        .as[(String, Long, Long, Boolean)].collect()
      assert(vs.exists(v => v._2 == 2L && !v._4),
        s"doc 2's duplicate lines must drop: ${vs.mkString(";")}")
      assert(vs.exists(_._2 == 3L),
        "null-text doc must still produce page-line verdicts")
      val rewritten = StreamingPara.rewrite(
          Seq((1L, "alpha beta gamma delta", "sA"),
            (2L, "alpha beta gamma delta", "sA"),
            (3L, null.asInstanceOf[String], "sA"))
            .toDF("doc_id", "text", "source"),
          sp.table("para_poison"))
        .as[(Long, String, Long, Long, String, Long)].collect()
        .map(r => r._1 -> r).toMap
      // doc 2 loses every line doc 1 keeps (its whole distinct page)
      assert(rewritten(2L)._4 > 0L, s"doc 2 kept its dups: $rewritten")
      assert(rewritten(1L)._4 == 0L, s"doc 1 lost a line: $rewritten")
    } finally q.stop()
  }
}
