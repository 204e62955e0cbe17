package graft.tools

import graft.Tables
import graft.streaming.{StreamingCurate, StreamingPack, StreamingSemanticDedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming-operator throughput: sustained docs/s (vectors/s) through
  * the stateful streaming twins, measured end to end over real
  * micro-batches — the ingestion-side number BASELINE.md's ChainPerf
  * is for the chain engine. Usage:
  * `StreamPerf [sfDir] [reps]` — the sf corpus replays `reps` times
  * with shifted ids (replicas are exact dups of the originals, so the
  * curate keeper state stays one entry per distinct content — the
  * steady-state shape of a deduplicating ingest).
  */
object StreamPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // throwaway state: skip the per-file checkpoint checksum writer
      // (see StreamScale — it collapsed under many queries in one JVM)
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docsDf = Tables.documents(spark, sfDir)
    val docs = docsDf.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    // the per-rep replay shifts ids by 1e7 per rep to keep reps
    // distinct in keyed state — ids at or above the shift would make
    // reps COLLIDE and silently measure a different state shape (e.g.
    // pointing this tool at a ScaleSlope output dir, whose minted ids
    // reach factor*1e7 — r07 review)
    val shift = 10000000L
    require(docs.nonEmpty && vecs.nonEmpty, s"empty corpus at $sfDir")
    require(docs.last._1 + (reps + 2) * shift > 0 &&
      docs.last._1 < shift && vecs.last._1 < shift,
      s"corpus ids must stay below the per-rep shift $shift " +
        s"(max doc=${docs.last._1}, max vec=${vecs.last._1})")
    val ev = StreamingCurate.frozenEvalIndex(
      docsDf.filter(col("doc_id") % 10 === 3)
        .select(col("doc_id"), col("text")))
    val cents = StreamingSemanticDedup.frozenCentroids(
      Tables.embeddings(spark, sfDir))

    // warmup batch (codegen + state-store init), then `reps` timed
    // replays with shifted ids; rate = replayed items / wall seconds
    def time(n: Long, feed: Long => Unit, q: StreamingQuery): Double =
      try {
        feed(-1L); q.processAllAvailable() // warmup
        val t0 = System.nanoTime()
        (0 until reps).foreach { r => feed(r.toLong); q.processAllAvailable() }
        n * reps / ((System.nanoTime() - t0) / 1e9)
      } finally q.stop()

    val memC = MemoryStream[(Long, String)]
    val curate = time(docs.length.toLong,
      r => { memC.addData(docs.map(d =>
        (d._1 + (r + 2) * 10000000L, d._2)).toIndexedSeq); () },
      StreamingCurate.audit(memC.toDF().toDF("doc_id", "text"), ev)
        .writeStream.format("noop").outputMode("append").start())
    System.err.println(f"[streamperf] curate: $curate%.0f docs/s")

    val memP = MemoryStream[(Long, String)]
    val pack = time(docs.length.toLong,
      r => { memP.addData(docs.map(d =>
        (d._1 + (r + 2) * 10000000L, d._2)).toIndexedSeq); () },
      StreamingPack.assignments(
          StreamingPack.tokEntries(memP.toDF().toDF("doc_id", "text")))
        .writeStream.format("noop").outputMode("append").start())
    System.err.println(f"[streamperf] pack: $pack%.0f docs/s")

    val memS = MemoryStream[(Long, Array[Float])]
    val sem = time(vecs.length.toLong,
      r => { memS.addData(vecs.map(v =>
        (v._1 + (r + 2) * 10000000L, v._2)).toIndexedSeq); () },
      StreamingSemanticDedup.verdicts(
          memS.toDF().toDF("vec_id", "embedding"), cents)
        .writeStream.format("noop").outputMode("append").start())
    System.err.println(f"[streamperf] semantic: $sem%.0f vecs/s")

    println(f"""{"metric":"stream_rate","curate_docs_s":$curate%.0f,"pack_docs_s":$pack%.0f,"semantic_vecs_s":$sem%.0f,"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
