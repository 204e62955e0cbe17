package graft.tools

import graft.Tables
import graft.streaming.{StreamingCurate, StreamingPack, StreamingRetrieval, StreamingSemanticDedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SCALE slopes (r08 verdict #5): StreamPerf measures
  * throughput at one corpus size; this tool applies the ScaleSlope
  * discipline to the stateful streaming twins —
  *
  *  1. CORPUS slope (`phase=corpus`): docs/s (vecs/s) and final
  *     state-store rows at 1× (sf0.1) vs FACTOR× (ScaleSlope's
  *     artifact-aware replication). Near-flat rate ⇒ per-item cost
  *     independent of corpus size; state rows scale with DISTINCT
  *     content (the designed bound: keeper state is one row per
  *     distinct norm key).
  *  2. STREAM-LENGTH flatness (`phase=length`): state rows per replay
  *     over R replays of per-replay-distinct content. Without a horizon
  *     the keeper table grows ≍ R×distinct (the unbounded-stream
  *     hazard); with the event-time horizon the table must PLATEAU —
  *     the TTL-bounded claim, measured. Pack's state is one
  *     (offset, hiId) pair per shard, so its row count must stay
  *     EXACTLY the shard count at any length/scale.
  *  3. SEMANTIC TTL eviction (`phase=sem`): membership-index bytes
  *     across replays — strictly growing without a TTL (bounded only by
  *     the per-cluster cap), dropping back to fresh-replay level after
  *     an idle gap longer than the TTL (cluster state evicted whole).
  *     A SHORT processing-time TTL is deliberately avoided: expired
  *     timeouts re-register each batch and trigger continuous no-data
  *     micro-batches, so `processAllAvailable` never settles (observed:
  *     6k+ no-data batches; each batch also pays this host's fork/exec
  *     checkpoint tax — see the session-builder comment).
  *
  * Run: sbt 'runMain graft.tools.StreamScale' [SCALE_FACTOR, default
  * 10; SPARK_GRAFT_STREAMSCALE_PHASE=corpus|length|sem re-runs one
  * phase alone]. One JSON line on stdout; table to stderr. Results are
  * recorded in BASELINE.md §Round 9.
  */
object StreamScale {

  private def stateRows(q: StreamingQuery): Long = {
    val ps = q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
    ps.map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
  }
  private def stateBytes(q: StreamingQuery): Long = {
    val ps = q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
    ps.map(_.stateOperators.map(_.memoryUsedBytes).sum).getOrElse(-1L)
  }

  final case class Meas(rate: Double, rows: Long, bytes: Long)

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SCALE_FACTOR", "10").toInt
    val out = s"/tmp/graft_streamscale$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val phase = sys.env.getOrElse("SPARK_GRAFT_STREAMSCALE_PHASE", "all")
    def phaseOn(p: String): Boolean = phase == "all" || phase == p
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // 8 state partitions, not 32: Hadoop's RawLocalFileSystem forks a
      // chmod/readlink PROCESS per checkpoint file op (jstack: the
      // stream thread lives in hadoop.util.Shell.runCommand), so
      // per-batch overhead scales with state-partition count, not data.
      // 8 keeps the micro-batch fork/exec tax bounded while the slope
      // compares the SAME config at both corpus scales.
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // measurement-only sessions use throwaway state checkpoints; the
      // per-file checksum writer (Spark 4.1 default-on) collapsed under
      // many short-lived queries in one JVM — all 32 state-commit tasks
      // parked in ChecksumCancellableFSDataOutputStream.close for 15+
      // minutes (jstack receipts, r09). Durable production checkpoints
      // keep the default.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      // no-data micro-batches OFF: with them on, these stateful query
      // shapes churned CONTINUOUS empty batches (3.6k commits for 3
      // data batches, observed), each paying the fork tax above. Both
      // timeout kinds still fire on the next DATA batch, which is what
      // every curve below feeds after its idle gap.
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    if (phaseOn("corpus")) ScaleSlope.buildCorpus(spark, base, out, factor)

    val shift = 1000000000L // above ScaleSlope's minted ids (factor×1e7)

    // ---- corpus slope: rate + final state at 1× and FACTOR× ----
    def measure(dir: String): (Meas, Meas, Meas, Meas) = {
      val docsDf = Tables.documents(spark, dir)
      val docs = docsDf.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1)
      val vecs = Tables.embeddings(spark, dir)
        .select(col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Array[Float])].collect().sortBy(_._1)
      val ev = StreamingCurate.frozenEvalIndex(
        docsDf.filter(col("doc_id") % 10 === 3)
          .select(col("doc_id"), col("text")))
      val cents = StreamingSemanticDedup.frozenCentroids(
        Tables.embeddings(spark, dir))
      // one warmup replay + one timed replay (ids shifted per replay;
      // replicas are exact dups, so keeper state holds the corpus's
      // distinct content — the steady-state deduplicating-ingest shape)
      def run(n: Long, feed: Long => Unit, q: StreamingQuery): Meas =
        try {
          feed(1L); q.processAllAvailable()
          val t0 = System.nanoTime()
          feed(2L); q.processAllAvailable()
          Meas(n / ((System.nanoTime() - t0) / 1e9),
            stateRows(q), stateBytes(q))
        } finally q.stop()
      val memC = MemoryStream[(Long, String)]
      val curate = run(docs.length.toLong,
        r => { memC.addData(docs.map(d =>
          (d._1 + r * shift, d._2)).toIndexedSeq); () },
        StreamingCurate.audit(memC.toDF().toDF("doc_id", "text"), ev)
          .writeStream.format("noop").outputMode("append").start())
      val memP = MemoryStream[(Long, String)]
      val pack = run(docs.length.toLong,
        r => { memP.addData(docs.map(d =>
          (d._1 + r * shift, d._2)).toIndexedSeq); () },
        StreamingPack.assignments(
            StreamingPack.tokEntries(memP.toDF().toDF("doc_id", "text")))
          .writeStream.format("noop").outputMode("append").start())
      val memS = MemoryStream[(Long, Array[Float])]
      val sem = run(vecs.length.toLong,
        r => { memS.addData(vecs.map(v =>
          (v._1 + r * shift, v._2)).toIndexedSeq); () },
        StreamingSemanticDedup.verdicts(
            memS.toDF().toDF("vec_id", "embedding"), cents)
          .writeStream.format("noop").outputMode("append").start())
      // retrieval is the STATELESS twin (frozen broadcast stats, no
      // state operator): rows/bytes report the -1 "no state" sentinel
      // by design — the curve of interest is the rate slope alone
      val stats = StreamingRetrieval.frozenStats(
        docsDf.select(col("doc_id"), col("text")))
      val memR = MemoryStream[(Long, String)]
      val retr = run(docs.length.toLong,
        r => { memR.addData(docs.map(d =>
          (d._1 + r * shift, d._2)).toIndexedSeq); () },
        StreamingRetrieval.scores(memR.toDF().toDF("doc_id", "text"), stats)
          .writeStream.format("noop").outputMode("append").start())
      (curate, pack, sem, retr)
    }
    val none = Meas(-1, -1, -1)
    val ((c1, p1, s1, r1), (cF, pF, sF, rF)) =
      if (phaseOn("corpus")) (measure(base), measure(out))
      else ((none, none, none, none), (none, none, none, none))
    if (phaseOn("corpus")) {
      def row(n: String, a: Meas, b: Meas): Unit = System.err.println(
        f"[streamscale] $n%-9s rate 1x=${a.rate}%8.0f/s ${factor}x=${b.rate}%8.0f/s " +
          f"(slope ${a.rate / b.rate}%.2f)  state rows ${a.rows}%7d -> ${b.rows}%7d " +
          f"bytes ${a.bytes}%9d -> ${b.bytes}%9d")
      row("curate", c1, cF); row("pack", p1, pF); row("semantic", s1, sF)
      row("retrieval", r1, rF)
    }

    // ---- stream-length flatness (1× corpus, R distinct replays) ----
    var unboundedCurve, horizonCurve, packCurve = Seq.empty[Long]
    if (phaseOn("length")) {
      val docsDf = Tables.documents(spark, base)
      val docs = docsDf.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1)
      val ev = StreamingCurate.frozenEvalIndex(
        docsDf.filter(col("doc_id") % 10 === 3)
          .select(col("doc_id"), col("text")))
      val replays = 6
      // per-replay-DISTINCT content: a replay-tagged token appended to
      // every doc makes each replay new to the keeper table (suffixed
      // ids alone would dedupe against replay 0 and hold state flat for
      // the wrong reason)
      def tagged(r: Int): IndexedSeq[(Long, String, java.sql.Timestamp)] =
        docs.map(d => (d._1 + (r + 1) * shift, d._2 + s" uniqreplaytok$r",
          new java.sql.Timestamp((r + 1) * 200L * 1000))).toIndexedSeq

      // control: NO horizon — the keeper table must grow ≍ replays
      val memU = MemoryStream[(Long, String, java.sql.Timestamp)]
      val qU = StreamingCurate.audit(
          memU.toDF().toDF("doc_id", "text", "event_time")
            .select(col("doc_id"), col("text")), ev)
        .writeStream.format("noop").outputMode("append").start()
      unboundedCurve = (0 until replays).map { r =>
        memU.addData(tagged(r)); qU.processAllAvailable(); stateRows(qU)
      }
      qU.stop()
      // horizon 60s of EVENT time; replays step 200s — each replay's
      // keepers are evictable one replay later. Plateau expected.
      val memH = MemoryStream[(Long, String, java.sql.Timestamp)]
      val qH = StreamingCurate.auditEventTime(
          memH.toDF().toDF("doc_id", "text", "event_time"), ev,
          java.time.Duration.ofSeconds(60))
        .writeStream.format("noop").outputMode("append").start()
      horizonCurve = (0 until replays).map { r =>
        memH.addData(tagged(r)); qH.processAllAvailable(); stateRows(qH)
      }
      qH.stop()
      System.err.println(
        s"[streamscale] curate state rows by replay, NO horizon:   " +
          unboundedCurve.mkString(" "))
      System.err.println(
        s"[streamscale] curate state rows by replay, 60s horizon:  " +
          horizonCurve.mkString(" "))

      // pack: state rows must equal the shard count at every length
      val memPL = MemoryStream[(Long, String)]
      val qPL = StreamingPack.assignments(
          StreamingPack.tokEntries(memPL.toDF().toDF("doc_id", "text")))
        .writeStream.format("noop").outputMode("append").start()
      packCurve = (0 until replays).map { r =>
        memPL.addData(docs.map(d =>
          (d._1 + (r + 1) * shift, d._2)).toIndexedSeq)
        qPL.processAllAvailable(); stateRows(qPL)
      }
      qPL.stop()
      System.err.println(
        s"[streamscale] pack state rows by replay (= shards):      " +
          packCurve.mkString(" "))
    }

    // ---- semantic TTL eviction ----
    var semNoTtl, semTtl = Seq.empty[(Long, Long)]
    if (phaseOn("sem")) {
      // a 2k-vector slice keeps the membership kernel and the per-batch
      // state rewrite cheap; the curve SHAPE is the deliverable
      val vecs = Tables.embeddings(spark, base)
        .select(col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Array[Float])].collect().sortBy(_._1).take(2000)
      val cents = StreamingSemanticDedup.frozenCentroids(
        Tables.embeddings(spark, base))
      // DISTINCT vectors per replay (tiny deterministic rotation of the
      // base vectors): verbatim replays would be recognized as dups and
      // not grow the membership index — flat for the wrong reason
      def replayVecs(r: Int): IndexedSeq[(Long, Array[Float])] =
        vecs.map { case (id, emb) =>
          val e2 = emb.clone()
          val i = r % e2.length
          e2(i) = e2(i) + 0.37f * (r + 1) // breaks cos≈1 against replay 0
          (id + (r + 1) * shift, e2)
        }.toIndexedSeq
      def semCurve(ttl: Option[java.time.Duration],
          idleBeforeLast: Boolean): Seq[(Long, Long)] = {
        val mem = MemoryStream[(Long, Array[Float])]
        val q = StreamingSemanticDedup.verdicts(
            mem.toDF().toDF("vec_id", "embedding"), cents, stateTtl = ttl)
          .writeStream.format("noop").outputMode("append").start()
        try (0 until 3).map { r =>
          if (r == 2 && idleBeforeLast) {
            // idle past the TTL, then feed a SINGLE vector: a group
            // only times out in a batch where it receives NO data, so
            // the post-idle batch must leave the other clusters idle —
            // they fire hasTimedOut and evict whole, while the one
            // data-bearing cluster survives
            Thread.sleep(ttl.map(_.toMillis + 2000).getOrElse(0L))
            mem.addData(replayVecs(r).take(1))
          } else mem.addData(replayVecs(r))
          q.processAllAvailable()
          (stateRows(q), stateBytes(q))
        } finally q.stop()
      }
      semNoTtl = semCurve(None, idleBeforeLast = false)
      semTtl = semCurve(Some(java.time.Duration.ofSeconds(5)),
        idleBeforeLast = true)
      System.err.println(
        s"[streamscale] semantic (rows,bytes) by replay, no TTL:        " +
          semNoTtl.mkString(" "))
      System.err.println(
        s"[streamscale] semantic (rows,bytes), 5s TTL, idle+1-vec last: " +
          semTtl.mkString(" "))
    }

    println(s"""{"metric":"stream_scale","factor":$factor,"phase":"$phase",""" +
      s""""rates_1x":{"curate":${c1.rate.round},"pack":${p1.rate.round},"semantic":${s1.rate.round},"retrieval":${r1.rate.round}},""" +
      s""""rates_${factor}x":{"curate":${cF.rate.round},"pack":${pF.rate.round},"semantic":${sF.rate.round},"retrieval":${rF.rate.round}},""" +
      s""""state_rows_1x":{"curate":${c1.rows},"pack":${p1.rows},"semantic":${s1.rows}},""" +
      s""""state_rows_${factor}x":{"curate":${cF.rows},"pack":${pF.rows},"semantic":${sF.rows}},""" +
      s""""curate_rows_by_replay_nohorizon":${unboundedCurve.mkString("[", ",", "]")},""" +
      s""""curate_rows_by_replay_horizon":${horizonCurve.mkString("[", ",", "]")},""" +
      s""""pack_rows_by_replay":${packCurve.mkString("[", ",", "]")},""" +
      s""""sem_bytes_by_replay_nottl":${semNoTtl.map(_._2).mkString("[", ",", "]")},""" +
      s""""sem_bytes_by_replay_ttl_idle":${semTtl.map(_._2).mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
