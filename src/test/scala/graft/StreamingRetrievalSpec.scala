package graft

import graft.streaming.{RetrievalStats, StreamingRetrieval}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming chunk retrieval (the q108 twin): scores streamed under
  * frozen collection stats must converge BIT-identically with batch
  * q108's scored relation when the stats are frozen from the streamed
  * corpus itself — under any chunking of the stream — and the top-k of
  * the accumulated sink must equal the catalog entry.
  */
class StreamingRetrievalSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def batchScored = graft.queries.TextAnalysis
    .chunkScored(Tables.documents(spark, sf))
    .select("doc_id", "chunk_id", "start_tok", "bm25")

  private def asRows(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("streamed scores == batch q108 scored relation, bit-identical, any chunking") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val docs = Tables.documents(sp, sf).select(col("doc_id"), col("text"))
    val stats = StreamingRetrieval.frozenStats(docs)
    val all = docs.as[(Long, String)].collect().sortBy(_._1)
    val batch = asRows(batchScored.collect())
    assert(batch.nonEmpty, "batch scored relation is empty — spec is vacuous")

    for (nChunks <- Seq(1, 4)) {
      val mem = MemoryStream[(Long, String)]
      val name = s"retr_scores_$nChunks"
      val q = StreamingRetrieval
        .scores(mem.toDF().toDF("doc_id", "text"), stats)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        all.grouped(math.max(1, (all.length + nChunks - 1) / nChunks))
          .foreach { c => mem.addData(c.toIndexedSeq); q.processAllAvailable() }
        val streamed = asRows(sp.table(name)
          .select("doc_id", "chunk_id", "start_tok", "bm25").collect())
        assert(streamed == batch,
          s"streamed scores diverged from batch under $nChunks-chunk delivery")
      } finally q.stop()
    }
  }

  test("top-10 over the accumulated sink equals catalog q108") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val docs = Tables.documents(sp, sf).select(col("doc_id"), col("text"))
    val stats = StreamingRetrieval.frozenStats(docs)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingRetrieval
      .scores(mem.toDF().toDF("doc_id", "text"), stats)
      .writeStream.format("memory").queryName("retr_topk")
      .outputMode("append").start()
    try {
      mem.addData(docs.as[(Long, String)].collect().toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val topk = sp.table("retr_topk")
      .orderBy(col("bm25").desc, col("doc_id"), col("chunk_id")).limit(10)
      .select("doc_id", "chunk_id", "start_tok", "bm25")
    assert(asRows(topk.collect()).sortBy(t => (t._1, t._2))
      == asRows(SparkEntry.queries("q108_chunk_retrieval")(sp, sf)
        .collect()).sortBy(t => (t._1, t._2)),
      "streamed top-10 diverged from catalog q108")
  }

  test("no-hit chunks emit nothing; an unseen query term scores at df=0 (max idf)") {
    // a chunk with no query term has no tf row in batch — and no
    // streamed score; a term the frozen collection never saw (df miss)
    // takes df = 0, the maximum-idf posture for unseen terms
    val st = new RetrievalStats(Map("join" -> 5L), 100L, 1000L)
    assert(StreamingRetrieval.scoreChunk("lorem ipsum dolor", st).isEmpty)
    val seen = StreamingRetrieval.scoreChunk("join the queue", st)
    val unseen = StreamingRetrieval.scoreChunk("hash the queue", st)
    assert(seen.nonEmpty && unseen.nonEmpty)
    // identical tf/dl, df 5 vs 0: the unseen term's (N − df) is larger
    assert(unseen.get > seen.get,
      s"df=0 must out-idf df=5: unseen=${unseen.get} seen=${seen.get}")
  }
}
