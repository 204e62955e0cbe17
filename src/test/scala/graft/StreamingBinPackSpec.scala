package graft

import graft.queries.Dedup
import graft.streaming.{StreamingBinPack, StreamingPack}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming boundary-respecting packing (the q77 twin): the per-shard
  * bounded best-fit state must make every micro-batch an exact
  * continuation — a stream delivered in batch q77's scan order
  * reproduces its placements exactly, bins carried in state accept
  * later arrivals without ever overflowing, and the placement machine
  * is the same code batch q77 runs.
  */
class StreamingBinPackSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("streaming placements converge with batch q77 across micro-batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val batch = SparkEntry.queries("q77_bestfit_pack")(sp, sf)
      .collect()
      .map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toMap

    // deliver documents in batch q77's scan order: capped token count
    // descending, then doc_id — each shard's subsequence then matches
    // the batch scan, so placements must be identical
    val ordered = Dedup.packToks(Tables.documents(sp, sf))
      .select(col("doc_id"),
        least(col("n_tok"), lit(Dedup.PackBudget)).as("n"))
      .as[(Long, Long)].collect()
      .sortBy { case (id, n) => (-n, id) }.map(_._1)
    val texts = Tables.documents(sp, sf)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    val docs = ordered.map(id => (id, texts(id)))

    val mem = MemoryStream[(Long, String)]
    val q = StreamingBinPack.placements(
        StreamingPack.tokEntries(mem.toDF().toDF("doc_id", "text")))
      .writeStream.format("memory").queryName("bin_placements")
      .outputMode("append").start()
    try {
      docs.grouped((docs.length + 3) / 4).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = sp.table("bin_placements")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5))).toMap
      assert(streamed == batch,
        s"streaming packer diverged: ${streamed.size} vs ${batch.size} docs")
    } finally q.stop()
  }

  test("open bins carry across batches: later arrivals fill earlier holes") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    // find two doc ids on the SAME shard (driver-side re-derivation of
    // packToks' salted hash)
    def shardOf(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"pack|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(12), 16) % 8
    }
    val shards = (1L to 50L).map(id => id -> shardOf(id))
    val (idA, sh) = shards.head
    val idB = shards.tail.find(_._2 == sh).get._1

    val mem = MemoryStream[(Long, String)]
    val q = StreamingBinPack.placements(
        StreamingPack.tokEntries(mem.toDF().toDF("doc_id", "text")),
        budget = 10L)
      .writeStream.format("memory").queryName("bin_carry")
      .outputMode("append").start()
    try {
      mem.addData((idA, "a b c d e f")) // 6 tokens → bin 0, off 0
      q.processAllAvailable()
      mem.addData((idB, "g h i")) // 3 tokens → must fill bin 0 at off 6
      q.processAllAvailable()
      val rows = sp.table("bin_carry")
        .select("doc_id", "bin_id", "bin_off", "n_tok")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(rows(idA) == ((0L, 0L, 6L)), rows.toString)
      assert(rows(idB) == ((0L, 6L, 3L)),
        s"second batch did not continue the open bin: $rows")
    } finally q.stop()
  }

  test("redelivered documents are dropped: placements survive at-least-once replay") {
    // r08 review: re-placing a replayed doc emitted a second
    // conflicting placement and double-consumed bin capacity
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mem = MemoryStream[graft.streaming.PackInput]
    val q = StreamingBinPack.placements(mem.toDS(), budget = 1000L)
      .writeStream.format("memory").queryName("binpack_replay")
      .outputMode("append").start()
    try {
      val rows = Seq(
        graft.streaming.PackInput(7L, 500L, 0L),
        graft.streaming.PackInput(9L, 400L, 0L))
      mem.addData(rows.toIndexedSeq); q.processAllAvailable()
      mem.addData(rows.toIndexedSeq); q.processAllAvailable() // replay
      mem.addData(Seq(graft.streaming.PackInput(11L, 100L, 0L)))
      q.processAllAvailable()
      val got = sp.table("binpack_replay")
        .as[graft.streaming.BinPlacement].collect().sortBy(_.doc_id)
      assert(got.map(_.doc_id).toSeq == Seq(7L, 9L, 11L),
        s"replay re-placed rows: ${got.toSeq}")
      // capacity was not double-consumed: all three fit bin 0
      assert(got.forall(_.bin_id == 0L), s"${got.toSeq}")
      assert(got.map(p => p.doc_id -> p.bin_off).toMap ==
        Map(7L -> 0L, 9L -> 500L, 11L -> 900L), s"${got.toSeq}")
    } finally q.stop()
  }
}
