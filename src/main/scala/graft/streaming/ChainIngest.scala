package graft.streaming

import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming ingestion of block events (SURVEY.md §0's source
  * layer): a file-based block stream driven through `foreachBatch` into
  * the GraphRunner — the Spark analogue of the reference's chain-sync
  * pull loop + bounded-channel handoff (S1/T7: backpressure is the
  * micro-batch pull model; `maxFilesPerTrigger` is the reference's
  * adaptive pipeline depth S3 collapsed into configuration).
  *
  * The dataflow runtime equivalence (reference T1-T3): one micro-batch =
  * one open unit-of-work; `foreachBatch(batchId, df)` + the StateStore's
  * idempotent commit give at-least-once + idempotent replay, the same
  * contract as `EfBlockUnitOfWork` (T3), with Spark's own checkpoint dir
  * playing the role of the chain cursor.
  */
object ChainIngest {

  val blockSchema: StructType = Encoders.product[Block].schema

  /** Stream blocks from parquet files appearing under `blocksDir` into the
    * runner. `Trigger.AvailableNow` = catch-up-then-stop (the reference's
    * drain-at-tip, T1 trigger c); `ProcessingTime` = follow-the-tip.
    */
  def start(spark: SparkSession, blocksDir: String, checkpointDir: String,
      runner: GraphRunner, trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    import spark.implicits._
    val reader = spark.readStream.schema(blockSchema)
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(blocksDir)
    src.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // blocks per micro-batch are few thousand rows of metadata; the
        // heavy lifting (explodes, joins, aggregation) happens inside the
        // runner's distributed plan, not on this driver-side seq.
        // Replay trimming: on restart (fresh stream checkpoint, or an
        // uncommitted last micro-batch re-delivered) drop blocks at or
        // before the store's own checkpoint — the same trim the reference
        // performs via the protocol's reconnect rollback (§3.3,
        // WorkerCrashRecoveryTest.cs:21-37). At-least-once delivery +
        // this trim + the atomic manifest = effectively-once.
        val cut = runner.latestCheckpointSlot
        val blocks = df.as[Block].collect().sortBy(_.slot).toSeq
          .filter(_.slot > cut)
        runner.flush(blocks)
        ()
      }
      .start()
  }
}

/** Watermarked event-time aggregations over a streaming `events` source —
  * the §2.8 rubric row. The same plan shape as batch q40 so the two can
  * be cross-checked; the watermark bounds state exactly as the
  * reference's `MaxRollbackSlots` bounds how far back corrections reach.
  */
object EventStreams {
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
}
