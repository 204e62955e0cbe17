package graft

import graft.streaming.StreamingCurate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming curation audit (the q79 twin): streamed per-document
  * verdicts must converge to batch q79's lexical bits under
  * doc_id-order arrival, and the exact-dup keeper state must be
  * first-wins, min-id within a batch, and idempotent under replay.
  */
class StreamingCurateSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("streamed verdicts equal batch q79 reasons & 15 under doc_id-order arrival") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val docs = Tables.documents(sp, sf)
    val ev = StreamingCurate.frozenEvalGrams(
      docs.filter(col("doc_id") % 10 === 3).select(col("doc_id"), col("text")))
    val all = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)

    val mem = MemoryStream[(Long, String)]
    val q = StreamingCurate.audit(mem.toDF().toDF("doc_id", "text"), ev)
      .writeStream.format("memory").queryName("curate_audit")
      .outputMode("append").start()
    try {
      all.grouped((all.length + 3) / 4).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = sp.table("curate_audit")
        .select("doc_id", "reasons").as[(Long, Int)].collect().toMap
      val batch = SparkEntry.queries("q79_curation_audit")(sp, sf)
        .select(col("doc_id"), col("reasons")).as[(Long, Int)].collect()
        .map { case (id, r) => id -> (r & 15) }.toMap
      assert(streamed.size == all.length,
        s"expected one verdict per doc: ${streamed.size} vs ${all.length}")
      assert(streamed == batch,
        s"audit diverged on ${streamed.count { case (k, v) => batch(k) != v }} docs")
      // non-vacuity: quality, contamination, and eval-shard bits all
      // fire in the testdata (exact-dup does not — q61 is empty at
      // sf0.01; the synthetic test below covers it)
      for (bit <- Seq(1, 4, 8))
        assert(batch.values.exists(r => (r & bit) != 0),
          s"bit $bit never fires - convergence is vacuous for it")
    } finally q.stop()
  }

  test("exact-dup keeper state: first-wins, min-id within batch, replay-idempotent") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    // long enough to pass quality, no eval grams frozen (empty set)
    val body = ("the quick brown fox jumps over a lazy dog and " * 20).trim
    val ev = sp.sparkContext.broadcast(Set.empty[String])
    val mem = MemoryStream[(Long, String)]
    val q = StreamingCurate.audit(mem.toDF().toDF("doc_id", "text"), ev)
      .writeStream.format("memory").queryName("curate_dup")
      .outputMode("append").start()
    def verdicts(): Map[Long, Seq[Int]] = {
      val sp2 = sp
      import sp2.implicits._
      sp.table("curate_dup").select("doc_id", "reasons")
        .as[(Long, Int)].collect().toSeq
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    }
    try {
      // batch 1: ids 20 and 10 share content — min-id 10 keeps even
      // though 20 sorts later in arrival tuple order
      mem.addData(Seq((20L, body), (10L, body), (30L, body + " extra")))
      q.processAllAvailable()
      val v1 = verdicts()
      assert(v1(10L) == Seq(0) && v1(20L) == Seq(2) && v1(30L) == Seq(0))
      // batch 2: later-arriving copy of kept content is a dup; replayed
      // keeper 10 re-emits keep (idempotent); replayed dup 20 re-emits dup
      mem.addData(Seq((40L, body), (10L, body), (20L, body)))
      q.processAllAvailable()
      val v2 = verdicts()
      assert(v2(40L) == Seq(2), s"late copy must be a dup: ${v2(40L)}")
      assert(v2(10L) == Seq(0, 0) && v2(20L) == Seq(2, 2),
        "replay must re-emit the original verdicts")
      // batch 3: out-of-order horizon — content of 50 arrives first as
      // id 50, then as id 5; first-wins keeps BOTH (the documented
      // divergence batch re-audit closes)
      mem.addData(Seq((50L, body + " tail")))
      q.processAllAvailable()
      mem.addData(Seq((5L, body + " tail")))
      q.processAllAvailable()
      val v3 = verdicts()
      assert(v3(50L) == Seq(0) && v3(5L) == Seq(0))
    } finally q.stop()
  }

  test("state TTL evicts idle keepers: a copy beyond the horizon is kept again") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val body = ("the quick brown fox jumps over a lazy dog and " * 20).trim
    val ev = sp.sparkContext.broadcast(Set.empty[String])
    val mem = MemoryStream[(Long, String)]
    val q = StreamingCurate.audit(mem.toDF().toDF("doc_id", "text"), ev,
        stateTtl = Some(java.time.Duration.ofMillis(500)))
      .writeStream.format("memory").queryName("curate_ttl")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"))
      .start()
    def stateRows: Long = Option(q.lastProgress)
      .flatMap(p => p.stateOperators.headOption)
      .map(_.numRowsTotal).getOrElse(-1L)
    def poll(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!cond) {
        assert(System.nanoTime() < deadline, s"timed out waiting: $what")
        Thread.sleep(50)
      }
    }
    try {
      mem.addData(Seq((10L, body)))
      poll("keeper indexed")(stateRows == 1L)
      poll("keeper evicted by TTL")(stateRows == 0L)
      // the keeper is gone: the same content arriving beyond the
      // horizon is KEPT again (the documented TTL trade)
      mem.addData(Seq((20L, body)))
      poll("second copy processed")(
        sp.table("curate_ttl").count() == 2)
      val r20 = sp.table("curate_ttl").filter(col("doc_id") === 20)
        .select("reasons").as[Int].head()
      assert(r20 == 0, s"beyond-horizon copy must be kept, got reasons=$r20")
    } finally q.stop()
  }
}
