package graft

import graft.streaming.StreamingProbe
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static near-dup probe (the q69 twin): a document stream
  * joined against the frozen band index must surface exactly the
  * collisions batch q69 reports, with no state and no watermark.
  */
class StreamingProbeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("a redelivered original never flags itself: self-collisions are filtered") {
    // at-least-once redelivery (or an index rebuilt from ingested
    // docs) sends a document through the probe while the frozen index
    // already contains it: every band collides with itself, and the
    // downstream min-per-doc verdict would mark the original a
    // duplicate of ITSELF (r07 review regression)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(20)
    val frozen = graft.queries.Dedup.bandEntries(docs)
    val hits = StreamingProbe.probe(docs, frozen) // same docs both sides
    assert(hits.filter(col("doc_id") === col("idx_doc")).count() == 0,
      "self-collisions must be filtered")
  }

  test("streamed probe collisions aggregate to exactly batch q69's near verdicts") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val docs = Tables.documents(sp, sf)
    val frozenBands = graft.queries.Dedup.bandEntries(
      docs.filter(col("doc_id") % 10 < 3).select(col("doc_id"), col("text")))
    val delta = docs.filter(col("doc_id") % 10 >= 3)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()

    val mem = MemoryStream[(Long, String)]
    val q = StreamingProbe.probe(
        mem.toDF().toDF("doc_id", "text"), frozenBands)
      .writeStream.format("memory").queryName("probe_hits")
      .outputMode("append").start()
    try {
      delta.grouped((delta.length + 2) / 3).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = sp.table("probe_hits")
        .groupBy("doc_id").agg(min("idx_doc").as("near_of"))
        .as[(Long, Long)].collect().toMap
      val batch = SparkEntry.queries("q69_incremental_dedup")(sp, sf)
        .select("doc_id", "near_of").as[(Long, Long)].collect()
        .filter(_._2 >= 0).toMap
      assert(streamed == batch,
        s"probe diverged: ${streamed.size} vs batch ${batch.size}")
      assert(batch.nonEmpty, "no collisions in test data — spec is vacuous")
    } finally q.stop()
  }
}
