package graft

import graft.queries.Dedup
import graft.streaming.{StreamingCurate, StreamingPack}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The composed streaming ingestion story: curation verdicts
  * (StreamingCurate, the q79 twin) feeding sequence packing
  * (StreamingPack, the q62 twin) across a bus — two stateful stages
  * the way production runs them, separated by a durable topic (here:
  * the spec relays each micro-batch's fresh keeps, preserving arrival
  * order). The composed streamed result must equal the composed BATCH
  * result: pack the documents batch q79 keeps (lexical bits only),
  * with q62's exact windows.
  *
  * What this pins beyond the per-stage specs: the keep/drop decisions
  * and the packing offsets stay consistent ACROSS the stage boundary —
  * a dropped doc never occupies pack space, a kept doc packs exactly
  * once, and offsets stay contiguous per shard over many micro-batches
  * of both stages.
  */
class StreamingPipelineSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("streamed curate -> pack equals the batch q79-keep -> q62-pack composition") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val docs = Tables.documents(sp, sf)
    val ev = StreamingCurate.frozenEvalGrams(
      docs.filter(col("doc_id") % 10 === 3).select(col("doc_id"), col("text")))
    val all = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val textOf = all.toMap

    // stage 1: streaming curation verdicts
    val memDocs = MemoryStream[(Long, String)]
    val curate = StreamingCurate.audit(
        memDocs.toDF().toDF("doc_id", "text"), ev)
      .writeStream.format("memory").queryName("pipe_verdicts")
      .outputMode("append").start()
    // stage 2: streaming packing of the kept docs
    val memKept = MemoryStream[(Long, String)]
    val pack = StreamingPack.assignments(
        StreamingPack.tokEntries(memKept.toDF().toDF("doc_id", "text")))
      .writeStream.format("memory").queryName("pipe_pack")
      .outputMode("append").start()
    try {
      val relayed = scala.collection.mutable.Set.empty[Long]
      all.grouped((all.length + 4) / 5).foreach { chunk =>
        memDocs.addData(chunk.toIndexedSeq)
        curate.processAllAvailable()
        // the bus: relay this batch's fresh keeps, in doc_id order
        val fresh = sp.table("pipe_verdicts")
          .filter(col("keep")).select("doc_id").as[Long].collect()
          .filterNot(relayed.contains).sorted
        if (fresh.nonEmpty) {
          relayed ++= fresh
          memKept.addData(fresh.toIndexedSeq.map(id => (id, textOf(id))))
          pack.processAllAvailable()
        }
      }
      val streamed = sp.table("pipe_pack")
        .select("doc_id", "shard", "seq_no", "seq_off", "n_tok")
        .as[(Long, Long, Long, Long, Long)].collect().toSet

      // batch composition: q79's lexical keeps -> q62's exact windows
      val keptIds = SparkEntry.queries("q79_curation_audit")(sp, sf)
        .filter((col("reasons").bitwiseAND(15)) === 0)
        .select("doc_id").as[Long].collect().toSet
      val expected = Dedup.packFromToks(Dedup.packTokEntries(
          docs.filter(col("doc_id").isin(keptIds.toSeq: _*))
            .select(col("doc_id"), col("text"))))
        .select("doc_id", "shard", "seq_no", "seq_off", "n_tok")
        .as[(Long, Long, Long, Long, Long)].collect().toSet

      assert(keptIds.nonEmpty && keptIds.size < all.length,
        s"keep set degenerate (${keptIds.size} of ${all.length}) - spec is vacuous")
      assert(streamed == expected,
        s"composition diverged: ${streamed.size} streamed vs ${expected.size} batch; " +
          s"first diff ${(streamed diff expected).take(3)} / ${(expected diff streamed).take(3)}")
    } finally { curate.stop(); pack.stop() }
  }
}
