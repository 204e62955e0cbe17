package graft

import graft.streaming.StreamingBoiler
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming boilerplate twin must reproduce batch q114's rewrite
  * EXACTLY when its chrome sets are frozen from the streamed corpus,
  * under any chunking — and pass unseen sources through unstripped
  * (the stated conservative posture).
  */
class StreamingBoilerSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("streamed strip equals batch q114 rows under 3-chunk delivery; unseen source passes through") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val docs = Tables.documents(sp, sf)
    val chrome = StreamingBoiler.frozenChrome(docs)
    // (the evidence-floor and threshold-boundary postures are pinned
    // on synthetic corpora in BoilerplateSpec; here the fixture just
    // needs a live census to stream against)
    assert(chrome.nonEmpty, "fixture must freeze a non-empty chrome set")
    val all = docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingBoiler.strip(
        mem.toDF().toDF("doc_id", "text", "source"), chrome)
      .writeStream.format("memory").queryName("boiler_stream")
      .outputMode("append").start()
    try {
      all.grouped((all.length + 2) / 3).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // one poison micro-batch: a source the frozen census never saw,
      // plus a NULL text (the ingest defense — must strip nothing and
      // must not poison the line builder)
      mem.addData(Seq((999999L, "brand new page words here", "srcNEW"),
        (999998L, null, "srcNEW")))
      q.processAllAvailable()
      val streamed = sp.table("boiler_stream")
        .as[(Long, String, Long, Long, String, Long)].collect()
      val batch = SparkEntry.queries("q114_boilerplate_strip")(sp, sf)
        .as[(Long, String, Long, Long, String, Long)].collect().toSet
      assert(batch.nonEmpty)
      assert(streamed.filter(_._1 < 999998L).toSet == batch,
        "streamed rewrite diverged from batch q114")
      val poison = streamed.find(_._1 == 999999L).get
      assert(poison._4 == 0L, s"unseen source was stripped: $poison")
      val nullDoc = streamed.find(_._1 == 999998L).get
      // null text = empty page: header + one empty body line (+footer:
      // 999998 % 3 = 2), nothing stripped (unseen source)
      assert(nullDoc._3 == 3L && nullDoc._4 == 0L,
        s"null-text defense regressed: $nullDoc")
      // and some streamed fixture doc WAS stripped (census is live)
      assert(streamed.exists(r => r._1 != 999999L && r._4 > 0L))
    } finally q.stop()
  }
}
