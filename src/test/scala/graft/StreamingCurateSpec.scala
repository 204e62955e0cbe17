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

  test("poison rows: null text yields a quality-fail verdict, never a crash") {
    // a null-text row (bypassing DocIngest's front-door guarantee)
    // previously NPE'd the typed deserializer / gram kernel, and on a
    // stream would crash-loop forever on checkpoint replay (r07
    // review regression). It must now produce a deterministic
    // quality-fail signal like the empty document it is treated as.
    val sp = spark
    import sp.implicits._
    val ev = sp.sparkContext.broadcast(graft.streaming.EvalGramIndex.empty)
    val df = Seq((1L, "short"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val sigs = StreamingCurate.signals(df, ev).collect().sortBy(_.doc_id)
    assert(sigs.length == 2)
    assert((sigs(1).base & 1) == 1, // quality-fail bit set
      s"null text must fail quality deterministically: ${sigs(1)}")
  }

  test("streamed verdicts equal batch q79 reasons & 15 under doc_id-order arrival") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val docs = Tables.documents(sp, sf)
    val ev = StreamingCurate.frozenEvalIndex(
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

  test("streamed decont-cut rewrites equal batch q104 exactly") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val docs = Tables.documents(sp, sf)
    val ev = StreamingCurate.frozenEvalIndex(
      docs.filter(col("doc_id") % 10 === 3).select(col("doc_id"), col("text")))
    val train = docs.filter(col("doc_id") % 10 =!= 3)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)

    val mem = MemoryStream[(Long, String)]
    val q = StreamingCurate.cutContaminated(
        mem.toDF().toDF("doc_id", "text"), ev)
      .writeStream.format("memory").queryName("decont_cut")
      .outputMode("append").start()
    try {
      train.grouped((train.length + 2) / 3).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = sp.table("decont_cut")
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
      val batch = SparkEntry.queries("q104_decont_cut")(sp, sf)
        .as[(Long, Long, String)].collect().toSeq
      assert(streamed == batch,
        s"decont-cut diverged on ${
          streamed.zip(batch).count { case (a, b) => a != b }} docs")
      // non-vacuity: contamination actually cuts tokens in the testdata
      assert(batch.exists(_._2 > 0), "no doc was ever cut — spec is vacuous")
      // and non-triviality the other way: most docs survive untouched
      assert(batch.exists(_._2 == 0), "every doc was cut — eval leak?")
    } finally q.stop()
  }

  test("exact-dup keeper state: first-wins, min-id within batch, replay-idempotent") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    // long enough to pass quality, no eval grams frozen (empty set)
    val body = ("the quick brown fox jumps over a lazy dog and " * 20).trim
    val ev = sp.sparkContext.broadcast(graft.streaming.EvalGramIndex.empty)
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

  test("EvalGramIndex: exact at 10x-shard scale, ~16 B/gram, distributed build agrees") {
    val sp = spark
    import sp.implicits._
    // ~300k synthetic grams — an eval shard an order of magnitude past
    // what a driver-collected Set[String] was comfortable with
    val rnd = new scala.util.Random(7)
    val present = (0 until 300000)
      .map(i => s"tok${i} " + rnd.alphanumeric.take(24).mkString).toSet
    val idx = graft.streaming.EvalGramIndex.ofStrings(present)
    assert(idx.size == present.size)
    // compactness: bloom bits + 16 B/gram — assert the per-gram weight
    // stays below 24 B (a boxed Set entry is >100 B)
    assert(idx.approxBytes / idx.size < 24,
      s"index weighs ${idx.approxBytes / idx.size} B/gram")
    // exactness both ways: every present gram found; absent grams that
    // the bloom may pass are killed by the md5 confirm — NO false
    // positives, unlike a bloom alone at fpp=0.03
    present.take(5000).foreach(g => assert(idx.contains(g)))
    (0 until 20000).foreach { i =>
      assert(!idx.contains(s"absent${i} " + rnd.alphanumeric.take(24).mkString))
    }
    // the distributed build (Spark-side unhex(md5)) must agree with the
    // driver-side build gram-for-gram on real eval-shard text
    val evalDocs = Tables.documents(sp, sf)
      .filter(col("doc_id") % 10 === 3).select(col("doc_id"), col("text"))
    val dist = graft.streaming.StreamingCurate.frozenEvalIndex(evalDocs).value
    val driver = graft.streaming.EvalGramIndex.ofStrings(
      evalDocs.select(col("text")).as[String].collect()
        .flatMap(t => graft.queries.Dedup.gramsOf(t, graft.queries.Dedup.DecontN))
        .toSet)
    assert(dist.size == driver.size, s"${dist.size} vs ${driver.size} grams")
    val probe = Tables.documents(sp, sf).select(col("text")).as[String]
      .head(50).flatMap(t =>
        graft.queries.Dedup.gramsOf(t, graft.queries.Dedup.DecontN))
    probe.foreach(g => assert(dist.contains(g) == driver.contains(g), g))
  }

  test("event-time audit: within-horizon converges, beyond-horizon straggler dropped, keeper evicts at watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val body = ("the quick brown fox jumps over a lazy dog and " * 20).trim
    val other = ("many slow green turtles walk under the warm sun and " * 20).trim
    val ev = sp.sparkContext.broadcast(graft.streaming.EvalGramIndex.empty)
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = graft.streaming.StreamingCurate.auditEventTime(
        mem.toDF().toDF("doc_id", "text", "event_time"), ev,
        java.time.Duration.ofSeconds(10))
      .writeStream.format("memory").queryName("curate_et")
      .outputMode("append").start()
    def verdicts(): Map[Long, Seq[Int]] = {
      val sp2 = sp
      import sp2.implicits._
      sp.table("curate_et").select("doc_id", "reasons")
        .as[(Long, Int)].collect().toSeq
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    }
    try {
      // t=100: first sighting keeps; t=105 (within horizon): dup
      mem.addData(Seq((10L, body, ts(100))))
      q.processAllAvailable()
      mem.addData(Seq((20L, body, ts(105))))
      q.processAllAvailable()
      val v1 = verdicts()
      assert(v1(10L) == Seq(0) && v1(20L) == Seq(2))
      // t=200 on OTHER content advances the watermark to 190 — far past
      // the keeper's last sighting (105) + horizon (10)
      mem.addData(Seq((30L, other, ts(200))))
      q.processAllAvailable()
      // next batch: the keeper times out (evicted). Trigger it with
      // more OTHER content so the body group is untouched by data.
      mem.addData(Seq((31L, other, ts(201))))
      q.processAllAvailable()
      // the same content re-arriving ABOVE the watermark is KEPT again
      // (beyond-horizon re-admission — the MaxRollbackSlots trade)
      mem.addData(Seq((40L, body, ts(203))))
      q.processAllAvailable()
      val v2 = verdicts()
      assert(v2(40L) == Seq(0),
        s"beyond-horizon copy must be kept again: ${v2(40L)}")
      // a straggler BELOW the watermark (event time 50 << 190) is
      // dropped before the stateful operator: no verdict at all
      mem.addData(Seq((60L, body, ts(50))))
      q.processAllAvailable()
      val v3 = verdicts()
      assert(!v3.contains(60L),
        s"beyond-horizon straggler must be dropped, got ${v3.get(60L)}")
      // within-horizon late data still converges: 41 shares 40's
      // content, arrives later with a slightly older-but-valid time
      mem.addData(Seq((41L, body, ts(202))))
      q.processAllAvailable()
      assert(verdicts()(41L) == Seq(2))
    } finally q.stop()
  }

  test("state TTL evicts idle keepers: a copy beyond the horizon is kept again") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val body = ("the quick brown fox jumps over a lazy dog and " * 20).trim
    val ev = sp.sparkContext.broadcast(graft.streaming.EvalGramIndex.empty)
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
