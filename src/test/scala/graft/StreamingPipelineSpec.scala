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
    val ev = StreamingCurate.frozenEvalIndex(
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

  test("full streaming q67: curate -> minhash near-dedup -> pack, three stages over the bus") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val docs = Tables.documents(sp, sf)
    val ev = StreamingCurate.frozenEvalIndex(
      docs.filter(col("doc_id") % 10 === 3).select(col("doc_id"), col("text")))
    val all = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val textOf = all.toMap

    val memDocs = MemoryStream[(Long, String)]
    val curate = StreamingCurate.audit(
        memDocs.toDF().toDF("doc_id", "text"), ev)
      .writeStream.format("memory").queryName("p3_verdicts")
      .outputMode("append").start()
    val memKept = MemoryStream[(Long, String)]
    val dedup = graft.streaming.StreamingDedup.candidates(
        graft.streaming.StreamingDedup.bandEntries(
          memKept.toDF().toDF("doc_id", "text")))
      .writeStream.format("memory").queryName("p3_pairs")
      .outputMode("append").start()
    val memSurv = MemoryStream[(Long, String)]
    val pack = StreamingPack.assignments(
        StreamingPack.tokEntries(memSurv.toDF().toDF("doc_id", "text")))
      .writeStream.format("memory").queryName("p3_pack")
      .outputMode("append").start()
    try {
      val relayedKept = scala.collection.mutable.Set.empty[Long]
      val relayedSurv = scala.collection.mutable.Set.empty[Long]
      all.grouped((all.length + 4) / 5).foreach { chunk =>
        memDocs.addData(chunk.toIndexedSeq)
        curate.processAllAvailable()
        val freshKept = sp.table("p3_verdicts")
          .filter(col("keep")).select("doc_id").as[Long].collect()
          .filterNot(relayedKept.contains).sorted
        if (freshKept.nonEmpty) {
          relayedKept ++= freshKept
          memKept.addData(freshKept.toIndexedSeq.map(id => (id, textOf(id))))
          dedup.processAllAvailable()
          // a pair (a, b) emits when the LATER doc b arrives, so this
          // batch's drop verdicts are complete here: b drops, a stays
          val dropped = sp.table("p3_pairs")
            .select("doc_b").as[Long].collect().toSet
          val surv = freshKept.filterNot(dropped.contains)
            .filterNot(relayedSurv.contains)
          if (surv.nonEmpty) {
            relayedSurv ++= surv
            memSurv.addData(surv.toIndexedSeq.map(id => (id, textOf(id))))
            pack.processAllAvailable()
          }
        }
      }
      val streamed = sp.table("p3_pack")
        .select("doc_id", "shard", "seq_no", "seq_off", "n_tok")
        .as[(Long, Long, Long, Long, Long)].collect().toSet

      // expected: the same declared semantics, derived independently —
      // q79's lexical keeps, then GREEDY first-wins near-dedup over the
      // exact band keys (a doc drops iff any of its bands already holds
      // an earlier kept doc; every entrant indexes its bands, dropped
      // or not — StreamingDedup's bucket contract), then q62's windows.
      // (Batch q67 resolves near-dups by connected components instead;
      // greedy first-wins is the INCREMENTAL variant, q69's shape.)
      val keptIds = SparkEntry.queries("q79_curation_audit")(sp, sf)
        .filter((col("reasons").bitwiseAND(15)) === 0)
        .select("doc_id").as[Long].collect().toSet
      val bandsOf = graft.queries.Dedup.bandEntries(
          docs.filter(col("doc_id").isin(keptIds.toSeq: _*))
            .select(col("doc_id"), col("text")))
        .as[(Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      val buckets = scala.collection.mutable.Set.empty[String]
      val survivors = scala.collection.mutable.ArrayBuffer.empty[Long]
      keptIds.toSeq.sorted.foreach { id =>
        val bands = bandsOf.getOrElse(id, Seq.empty[String])
        if (!bands.exists(buckets.contains)) survivors += id
        buckets ++= bands
      }
      val expected = Dedup.packFromToks(Dedup.packTokEntries(
          docs.filter(col("doc_id").isin(survivors.toSeq: _*))
            .select(col("doc_id"), col("text"))))
        .select("doc_id", "shard", "seq_no", "seq_off", "n_tok")
        .as[(Long, Long, Long, Long, Long)].collect().toSet

      assert(survivors.size < keptIds.size,
        "no near-dup dropped between curate and pack - the dedup stage is vacuous")
      assert(streamed == expected,
        s"3-stage composition diverged: ${streamed.size} vs ${expected.size}; " +
          s"diff ${(streamed diff expected).take(3)} / ${(expected diff streamed).take(3)}")
    } finally { curate.stop(); dedup.stop(); pack.stop() }
  }
}
