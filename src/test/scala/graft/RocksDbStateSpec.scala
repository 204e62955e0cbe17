package graft

import graft.streaming.StreamingCurate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** State-store provider portability: the streaming twins' keyed state
  * must behave identically on the RocksDB provider — the 100 TB
  * configuration, where per-executor state lives off-heap/on-disk in
  * RocksDB instead of the default in-memory HashMap provider, so state
  * size is bounded by local SSD rather than executor heap. One config
  * line flips it; this spec proves the flip is BEHAVIOR-NEUTRAL
  * (verdict-for-verdict equal to the default provider against batch
  * q79) and actually engaged (RocksDB custom metrics present in the
  * progress events).
  */
class RocksDbStateSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"
  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("StreamingCurate on RocksDB state equals batch q79 and reports rocksdb metrics") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = sp.conf.getOption(key)
    sp.conf.set(key, Provider)
    try {
      val docs = Tables.documents(sp, sf)
      val ev = StreamingCurate.frozenEvalIndex(
        docs.filter(col("doc_id") % 10 === 3)
          .select(col("doc_id"), col("text")))
      val all = docs.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1)
      val mem = MemoryStream[(Long, String)]
      val q = StreamingCurate.audit(mem.toDF().toDF("doc_id", "text"), ev)
        .writeStream.format("memory").queryName("rocks_curate")
        .outputMode("append").start()
      try {
        all.grouped((all.length + 3) / 4).foreach { chunk =>
          mem.addData(chunk.toIndexedSeq)
          q.processAllAvailable()
        }
        val streamed = sp.table("rocks_curate")
          .select("doc_id", "reasons").as[(Long, Int)].collect().toMap
        val batch = SparkEntry.queries("q79_curation_audit")(sp, sf)
          .select(col("doc_id"), col("reasons")).as[(Long, Int)].collect()
          .map { case (id, r) => id -> (r & 15) }.toMap
        assert(streamed.size == all.length)
        assert(streamed == batch,
          s"rocksdb-state verdicts diverged on ${
            streamed.count { case (k, v) => batch(k) != v }} docs")
        // the provider really engaged: rocksdb custom metrics surface
        // on the stateful operator's progress
        val metrics = Option(q.lastProgress)
          .flatMap(_.stateOperators.headOption)
          .map(_.customMetrics.keySet())
          .getOrElse(java.util.Collections.emptySet[String]())
        assert(metrics.stream().anyMatch(_.toLowerCase.contains("rocksdb")),
          s"no rocksdb metrics in $metrics")
      } finally q.stop()
    } finally {
      saved.fold(sp.conf.unset(key))(v => sp.conf.set(key, v))
    }
  }
}
