package graft

import graft.streaming.StreamingBalance
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming rebalance twin must reproduce batch q112's sample
  * EXACTLY when its rates are frozen from the streamed corpus, under
  * any chunking — and drop unseen strata (the stated conservative
  * posture) instead of admitting them unsampled.
  */
class StreamingBalanceSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("streamed sample equals batch q112 membership under 3-chunk delivery; unseen strata drop") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val docs = Tables.documents(sp, sf)
    val rates = StreamingBalance.frozenRates(docs)
    assert(rates.values.max == 1.0 && rates.values.min < 1.0,
      s"fixture must have a whole-kept tail and a downsampled head: $rates")
    val all = docs.select(col("doc_id"), col("lang"))
      .as[(Long, String)].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingBalance.sample(
        mem.toDF().toDF("doc_id", "lang"), rates)
      .writeStream.format("memory").queryName("bal_stream")
      .outputMode("append").start()
    try {
      all.grouped((all.length + 2) / 3).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // one poison micro-batch: a stratum the frozen corpus never saw
      mem.addData(Seq((999999L, "xx")))
      q.processAllAvailable()
      val streamed = sp.table("bal_stream")
        .select("doc_id").as[Long].collect().toSet
      val batch = SparkEntry.queries("q112_balanced_sample")(sp, sf)
        .select("doc_id").as[Long].collect().toSet
      assert(batch.nonEmpty && streamed == batch,
        s"streamed sample diverged: ${streamed.size} vs ${batch.size}")
      assert(!streamed.contains(999999L), "unseen stratum was admitted")
    } finally q.stop()
  }
}
