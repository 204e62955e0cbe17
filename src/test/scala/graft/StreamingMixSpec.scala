package graft

import graft.streaming.StreamingMix
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming budget admission (the q68 twin): per-source spent state
  * must make every micro-batch an exact continuation — a stream in
  * q68's (salt, h, doc_id) order reproduces the batch sampler's
  * admitted set and start offsets exactly, across any chunking.
  */
class StreamingMixSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("streaming admission converges with batch q68 across micro-batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val batch = SparkEntry.queries("q68_mixture_sample")(sp, sf)
      .select("doc_id", "start_off")
      .as[(Long, Long)].collect().toMap

    // q68's global per-source order, reconstructed from the shared
    // projection: (salt, h, doc_id)
    val ordered = graft.queries.Dedup.mixTokEntries(Tables.documents(sp, sf))
      .select(col("doc_id"), col("source"), col("n_tok"), col("h"),
        col("salt"))
      .as[(Long, String, Long, Long, Long)].collect()
      .sortBy(t => (t._5, t._4, t._1))
      .map(t => graft.streaming.MixInput(t._1, t._2, t._3))

    val mem = MemoryStream[graft.streaming.MixInput]
    val q = StreamingMix.verdicts(mem.toDS())
      .writeStream.format("memory").queryName("mix_verdicts")
      .outputMode("append").start()
    try {
      // five micro-batches partitioning q68's order: the spent counter
      // must carry across every boundary, and within each batch the
      // packer re-establishes the canonical (salt, h, doc_id) order
      // itself — so convergence holds under any in-order chunking
      ordered.grouped((ordered.length + 4) / 5).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = sp.table("mix_verdicts")
        .as[graft.streaming.MixVerdict].collect()
      val admitted = streamed.filter(_.admitted)
        .map(v => v.doc_id -> v.spent_before).toMap
      assert(admitted == batch,
        s"streaming admission diverged: ${admitted.size} vs batch ${batch.size}")
      assert(streamed.exists(!_.admitted), "nothing rejected — vacuous")
    } finally q.stop()
  }

  test("per-source state is one long: a later batch continues the spend exactly") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mem = MemoryStream[graft.streaming.MixInput]
    val q = StreamingMix.verdicts(mem.toDS(), Map("s" -> 10L))
      .writeStream.format("memory").queryName("mix_small")
      .outputMode("append").start()
    try {
      // 6 tokens admitted (spent 0), then 6 more in a later batch:
      // starts at spent=6 < 10 so admitted; a third doc starts at 12
      // >= 10 and must be rejected — state, not a reset, decides.
      // Delivery follows the documented canonical (salt, h, doc_id)
      // order (the replay guard keys on it — r08), so the token
      // amounts 6/6/1 attach to the docs in THAT order.
      val md = java.security.MessageDigest.getInstance("MD5")
      val canonical = Seq(1L, 2L, 3L).sortBy(id =>
        (graft.queries.Dedup.md5Prefix48(md, s"mix|$id") %
          graft.queries.Dedup.MixSalts,
          graft.queries.Dedup.md5Prefix48(md, s"mix|$id"), id))
      val toks = Seq(6L, 6L, 1L)
      canonical.zip(toks).foreach { case (id, n) =>
        mem.addData(graft.streaming.MixInput(id, "s", n))
        q.processAllAvailable()
      }
      val byDoc = sp.table("mix_small")
        .as[graft.streaming.MixVerdict].collect()
        .map(v => v.doc_id -> v).toMap
      val rows = canonical.map(byDoc)
      assert(rows.map(v => (v.admitted, v.spent_before)) ==
        Seq((true, 0L), (true, 6L), (false, 12L)), rows.mkString(", "))
    } finally q.stop()
  }

  test("redelivered documents are dropped: admission state survives at-least-once replay") {
    // r08 review: re-admitting a replayed doc advanced the spent
    // counter twice, permanently shrinking the admitted set vs q68
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mem = MemoryStream[graft.streaming.MixInput]
    val q = StreamingMix.verdicts(mem.toDS(), Map("web" -> 100L))
      .writeStream.format("memory").queryName("mix_replay")
      .outputMode("append").start()
    try {
      val docs = Seq(
        graft.streaming.MixInput(1L, "web", 60L),
        graft.streaming.MixInput(2L, "web", 30L))
      val ordered = {
        val md = java.security.MessageDigest.getInstance("MD5")
        docs.sortBy(m =>
          (graft.queries.Dedup.md5Prefix48(md, s"mix|${m.doc_id}") %
            graft.queries.Dedup.MixSalts, m.doc_id))
      }
      mem.addData(ordered.toIndexedSeq); q.processAllAvailable()
      // the at-least-once source redelivers the SAME rows
      mem.addData(ordered.toIndexedSeq); q.processAllAvailable()
      val got = sp.table("mix_replay")
        .as[graft.streaming.MixVerdict].collect()
      assert(got.length == 2, s"replay re-emitted verdicts: ${got.toSeq}")
      assert(got.forall(_.admitted), s"${got.toSeq}")
      assert(got.map(_.spent_before).sorted.toSeq == Seq(0L, 60L).sorted ||
        got.map(_.spent_before).sorted.toSeq == Seq(0L, 30L).sorted,
        s"spent advanced twice: ${got.toSeq}")
    } finally q.stop()
  }
}
