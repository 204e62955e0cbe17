package graft

import graft.streaming.StreamingSemanticDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming semantic dedup (the q70 twin): streamed per-vector
  * verdicts must be bit-identical to batch q70 under vec_id-order
  * arrival — cluster assignment (rounded cosine, min-cid ties), dup_of
  * (lowest τ-close earlier neighbor), and keep flags all included; any
  * drift in the JVM twins of FloatDot / round / tie-breaks fails this.
  */
class StreamingSemanticSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("streamed verdicts equal batch q70 exactly under vec_id-order arrival; replay is idempotent") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val emb = Tables.embeddings(sp, sf)
    val cents = StreamingSemanticDedup.frozenCentroids(emb)
    val all = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)

    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingSemanticDedup.verdicts(
        mem.toDF().toDF("vec_id", "embedding"), cents)
      .writeStream.format("memory").queryName("sem_verdicts")
      .outputMode("append").start()
    try {
      val chunks = all.grouped((all.length + 3) / 4).toSeq
      chunks.foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = sp.table("sem_verdicts")
        .select("vec_id", "cid", "dup_of")
        .as[(Long, Long, Long)].collect().toSeq
      val batch = SparkEntry.queries("q70_semantic_dedup")(sp, sf)
        .select(col("vec_id").cast("long"), col("cid").cast("long"),
          col("dup_of").cast("long"))
        .as[(Long, Long, Long)].collect().toSeq
      assert(streamed.size == all.length,
        s"one verdict per vector expected: ${streamed.size} vs ${all.length}")
      assert(streamed.sorted == batch.sorted, {
        val s = streamed.toSet; val b = batch.toSet
        s"diverged: ${(s diff b).take(3)} vs batch ${(b diff s).take(3)}"
      })
      assert(batch.exists(_._3 >= 0),
        "no semantic dups in test data - convergence is vacuous")
      // replay the first chunk: verdicts re-emit identically (state is
      // id-checked, so at-least-once delivery cannot double-insert)
      mem.addData(chunks.head.toIndexedSeq)
      q.processAllAvailable()
      val replayed = sp.table("sem_verdicts")
        .select("vec_id", "cid", "dup_of")
        .as[(Long, Long, Long)].collect().toSeq
      val extra = replayed.diff(streamed)
      assert(extra.toSet.subsetOf(streamed.toSet),
        s"replay changed verdicts: ${extra.diff(streamed).take(3)}")
      assert(extra.size == chunks.head.length,
        s"replay must re-emit each replayed vector once: ${extra.size}")
    } finally q.stop()
  }

  test("state TTL evicts idle clusters: a tau-close vector beyond the horizon is kept") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val cents = sp.sparkContext.broadcast(
      Seq((100L, Array(1.0f, 0.0f), 1.0)))
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingSemanticDedup.verdicts(
        mem.toDF().toDF("vec_id", "embedding"), cents,
        stateTtl = Some(java.time.Duration.ofMillis(500)))
      .writeStream.format("memory").queryName("sem_ttl")
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
      mem.addData(Seq((1L, Array(1.0f, 0.0f))))
      poll("cluster indexed")(stateRows == 1L)
      poll("cluster evicted by TTL")(stateRows == 0L)
      // the index is gone: an identical vector beyond the horizon has
      // no stored neighbor to match - kept (the documented TTL trade)
      mem.addData(Seq((2L, Array(1.0f, 0.0f))))
      poll("second vector processed")(sp.table("sem_ttl").count() == 2)
      val v2 = sp.table("sem_ttl").filter(col("vec_id") === 2)
        .select("dup_of").as[Long].head()
      assert(v2 == -1L, s"beyond-horizon vector must be kept, got dup_of=$v2")
    } finally q.stop()
  }

  test("stateless semantic decontamination converges bit-identically with batch q89 under any chunking") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(sp, sf)
    val ev = graft.streaming.StreamingSemDecont.frozenEvalVecs(emb)
    val all = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val batch = SparkEntry.queries("q89_semantic_decontaminate")(sp, sf)
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val mem = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.StreamingSemDecont.verdicts(
        mem.toDF().toDF("vec_id", "embedding"), ev)
      .writeStream.format("memory").queryName("sem_decont")
      .outputMode("append").start()
    try {
      all.grouped((all.length + 2) / 3).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = sp.table("sem_decont")
        .as[(Long, Double, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got.size == batch.size, s"${got.size} vs ${batch.size}")
      assert(got == batch, {
        val bad = got.collect { case (k, v) if batch(k) != v => (k, v, batch(k)) }
        s"diverged on ${bad.size}: ${bad.take(3)}"
      })
      assert(batch.values.exists(_._2),
        "contamination bit never fires - convergence is vacuous for it")
      // STATELESS: the query runs with no state store at all
      val stateOps = Option(q.lastProgress).map(_.stateOperators.length)
      assert(stateOps.contains(0), s"probe must be stateless: $stateOps")
    } finally q.stop()
  }
}
