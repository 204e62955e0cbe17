package graft

import graft.streaming.StreamingPack
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Checkpoint RECOVERY for the stateful streaming operators — the
  * operational property the convergence specs don't touch: a stream
  * that stops (crash, deploy, rebalance) must resume from its
  * checkpoint with its `flatMapGroupsWithState` state intact, not
  * restart packing from offset zero. Driven on StreamingPack (the
  * simplest state machine: ONE LONG per shard), whose q62 convergence
  * is already pinned — so if the restarted composite equals batch q62,
  * the state provably crossed the restart.
  */
class StreamingRecoverySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("pack offsets survive a stop/restart from checkpoint: the composite equals batch q62") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val batch = SparkEntry.queries("q62_pack_sequences")(sp, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val docs = Tables.documents(sp, sf)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val (first, second) = docs.splitAt(docs.length / 2)

    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-recovery-ckpt").toString
    // foreachBatch + batchId-keyed map: re-delivered batches after the
    // restart overwrite identically instead of double-counting (the
    // standard idempotent-sink discipline; memory sinks don't recover)
    val got = new java.util.concurrent.ConcurrentHashMap[
      Long, Seq[(Long, Long, Long, Long, Long)]]()
    val mem = MemoryStream[(Long, String)]
    def start() = StreamingPack.assignments(
        StreamingPack.tokEntries(mem.toDF().toDF("doc_id", "text")))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          graft.streaming.PackAssignment], id: Long) =>
        got.put(id, df.collect().toSeq
          .map(a => (a.doc_id, a.shard, a.seq_no, a.seq_off, a.n_tok)))
        ()
      }.start()

    val q1 = start()
    try {
      mem.addData(first.toIndexedSeq)
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start() // resumes from ckpt: shard offsets must carry over
    try {
      mem.addData(second.toIndexedSeq)
      q2.processAllAvailable()
      val streamed = got.values().toArray.toSeq
        .flatMap(_.asInstanceOf[Seq[(Long, Long, Long, Long, Long)]])
        .map { case (d, sh, sn, so, nt) => d -> ((sh, sn, so, nt)) }.toMap
      assert(streamed.size == docs.length,
        s"every doc packed once: ${streamed.size} vs ${docs.length}")
      assert(streamed == batch,
        "restarted packer diverged from batch q62 - state did not survive the restart")
    } finally {
      q2.stop()
      val root = java.nio.file.Paths.get(ckpt)
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }
  }
}
