package graft.streaming

import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

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
    *
    * Acquires the store's single-writer lock before processing (reference
    * T13: the worker awaits lock acquisition before any chain pull,
    * `CardanoIndexWorker.cs:81-84`) and releases it when the query
    * terminates. Blocks never materialize on the driver: the micro-batch
    * DataFrame flows straight into the runner, which derives checkpoint
    * windows from a ≤10-row top-k aggregate.
    */
  def start(spark: SparkSession, blocksDir: String, checkpointDir: String,
      runner: GraphRunner, trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None,
      lockWaitMs: Long = 15000L,
      telemetry: Option[Telemetry] = None,
      wireFormat: Option[String] = None): StreamingQuery = {
    val lock = new SingleInstanceLock(runner.store.root)
    if (!lock.waitAcquire(lockWaitMs)) {
      lock.close()
      throw new IllegalStateException(
        s"another indexer instance holds ${runner.store.root} (T13)")
    }
    // T9/T10 startup reconciliation: adjust fresh-dependent start points
    // and trim to the graph-safe slot before any batch flows.
    try runner.reconcileStartup()
    catch { case e: Throwable => lock.close(); throw e }
    val query =
      try {
        // Wire-format switch, mirroring FileChainProvider: a directory of
        // real `.cbor` blocks streams through the binaryFile source with
        // EXECUTOR-SIDE CborBlock decode (undecodable files skip — the
        // reference's null-and-skip), parquet block rows otherwise. Either
        // way the micro-batch carries the same Block schema downstream.
        //
        // The format is resolved ONCE, here (r08 review): pass `wireFormat`
        // explicitly for a follow-the-tip deployment whose directory may be
        // EMPTY at start — sniffing an empty dir locks in the parquet
        // reader and the first .cbor file then kills the query. A MIXED
        // directory fails loudly rather than silently never indexing the
        // minority format.
        val hasCbor = graft.sources.CborBlock.isCborDir(blocksDir)
        val hasParquet = Option(new java.io.File(blocksDir).listFiles)
          .exists(_.exists(f => f.getName.endsWith(".parquet")))
        if (wireFormat.isEmpty && hasCbor && hasParquet)
          throw new IllegalArgumentException(
            s"$blocksDir holds BOTH .cbor and .parquet blocks — the sniffed " +
              "reader would silently drop one format; pass wireFormat")
        val fmt = wireFormat.getOrElse(if (hasCbor) "cbor" else "parquet")
        require(fmt == "cbor" || fmt == "parquet", s"wireFormat $fmt")
        val src =
          if (fmt == "cbor") {
            import spark.implicits._
            import org.apache.spark.sql.types._
            // binaryFile's fixed schema, stated explicitly (streaming file
            // sources don't self-describe)
            val binSchema = StructType(Seq(
              StructField("path", StringType),
              StructField("modificationTime", TimestampType),
              StructField("length", LongType),
              StructField("content", BinaryType)))
            val r = spark.readStream.format("binaryFile").schema(binSchema)
            maxFilesPerTrigger
              .fold(r)(n => r.option("maxFilesPerTrigger", n))
              .load(s"$blocksDir/*.cbor")
              .select(col("content")).as[Array[Byte]]
              .flatMap(b => graft.sources.CborBlock.decode(b).map(_._2))
              .toDF()
          } else {
            val reader = spark.readStream.schema(blockSchema)
            maxFilesPerTrigger
              .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
              .parquet(blocksDir)
          }
        src.writeStream
          .trigger(trigger)
          .option("checkpointLocation", checkpointDir)
          .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
            // Replay trimming: on restart (fresh stream checkpoint, or an
            // uncommitted last micro-batch re-delivered) drop blocks at or
            // before the store's own checkpoint — the same trim the
            // reference performs via the protocol's reconnect rollback
            // (§3.3, WorkerCrashRecoveryTest.cs:21-37). At-least-once
            // delivery + this trim + the atomic manifest = effectively-once.
            val cut = runner.latestCheckpointSlot
            runner.flush(df.filter(col("slot") > cut).toDF())
            ()
          }
          .start()
      } catch { case e: Throwable => lock.close(); throw e }
    // The listener is both the lock's release point and the §2.12
    // observability feed (per-micro-batch rows/duration into the
    // progress table).
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.id == query.id) telemetry.foreach(
          // triggerExecution already ENCOMPASSES the other durationMs
          // components (addBatch/getBatch/walCommit...); summing them
          // double-counted the batch time ~2x (r08 review)
          _.recordStreamBatch(e.progress.batchId, e.progress.numInputRows,
            e.progress.durationMs.asScala.get("triggerExecution")
              .map(_.toDouble / 1e3)
              .getOrElse(
                e.progress.durationMs.asScala.values.map(_.toDouble).sum / 1e3)))
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == query.id) {
          lock.close()
          spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(listener)
    // Registration races the query: a run that terminated (or failed)
    // before addListener would never see its termination event and leak
    // the lock forever. lock.close() is idempotent, so closing here as
    // well as in a late-but-delivered event is safe.
    if (!query.isActive) {
      lock.close()
      spark.streams.removeListener(listener)
    }
    query
  }
}

/** Watermarked event-time aggregations over a streaming `events` source —
  * the §2.8 rubric row. The same plan shape as batch q40 so the two can
  * be cross-checked; the watermark bounds state exactly as the
  * reference's `MaxRollbackSlots` bounds how far back corrections reach.
  */
/** Input/state/output rows of [[EventStreams.funnelStages]]. Timestamps in
  * state are event-time MICROS (the events table's native precision after
  * Spark's ns→µs parquet truncation); -1 = stage not reached.
  */
case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
    event_type: String)
case class FunnelState(vTs: Long, cTs: Long, pTs: Long)
case class StageChange(user_id: Long, stage: Int, ts: java.sql.Timestamp)

object EventStreams {
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Streaming exact dedup — the streaming twin of batch q30: duplicates
    * (by content key) are dropped while their key is inside the
    * watermark window, and the dedup STATE IS BOUNDED by that window —
    * the property that makes streaming dedup feasible at 100 TB/day (an
    * unbounded `dropDuplicates` would accrete state forever). The
    * watermark is the `MaxRollbackSlots` analogue: a bound on how far
    * back corrections/duplicates may reach.
    */
  def dedupedEvents(events: DataFrame, keyCol: String,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** STREAM-STREAM interval join (SURVEY §2.8's remaining join rubric):
    * click→purchase attribution — every purchase matched to the clicks
    * of the same user within the preceding `horizonMin` minutes, both
    * sides LIVE streams. The time-range predicate plus per-side
    * watermarks is what makes this runnable forever: Spark derives a
    * state-retention bound for EACH side from the watermark and the
    * interval (a click can only ever match purchases up to horizon
    * later, so once the purchase watermark passes click.ts + horizon
    * the click's join state evicts) — without the range condition the
    * join state would accrete unboundedly, the 100 TB/day killer.
    * Append-mode inner join: matches emit as they form; a side arriving
    * later than its watermark allows is dropped, the same late-data
    * contract as every windowed operator here.
    */
  def attributedPurchases(clicks: DataFrame, purchases: DataFrame,
      watermark: String = "10 minutes",
      horizonMin: Int = 30): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    c.join(p, expr(
      s"""c_user = p_user AND
         |p_ts >= c_ts AND
         |p_ts <= c_ts + interval $horizonMin minutes""".stripMargin))
      .select(col("c_user").as("user_id"), col("c_ts"), col("p_ts"))
  }

  /** Streaming funnel-stage tracking via `flatMapGroupsWithState` — the
    * custom-state twin of batch q45 and the engine's arbitrary-stateful
    * operator surface (SURVEY.md §2.10: where declarative windows can't
    * express the semantics, per-key state + a fold does). State per user
    * is THREE longs (first view / qualifying click / qualifying purchase,
    * in event-time micros) regardless of event volume, and a stage
    * transition row is emitted exactly once when it happens — at 100 TB/
    * day the state store holds |users| × 24 bytes, not the event history.
    *
    * Events inside one micro-batch chunk are folded in (ts, stage-rank)
    * order so an equal-timestamp view is seen before the click that needs
    * it, matching q45's strict `>` stage ordering; across micro-batches
    * the stream is assumed event-time ordered (enforce upstream with a
    * watermark + sort, as `ChainIngest` does for blocks via slot order).
    */
  def funnelStages(events: Dataset[FunnelEvent]): Dataset[StageChange] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    val rank = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageChange](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid, chunk, state) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          val out = Seq.newBuilder[StageChange]
          chunk.toSeq
            .sortBy(e => (micros(e.ts), rank.getOrElse(e.event_type, 3)))
            .foreach { e =>
              val t = micros(e.ts)
              e.event_type match {
                case "view" if st.vTs < 0 =>
                  st = st.copy(vTs = t); out += StageChange(uid, 1, e.ts)
                case "click" if st.vTs >= 0 && st.cTs < 0 && t > st.vTs =>
                  st = st.copy(cTs = t); out += StageChange(uid, 2, e.ts)
                case "purchase" if st.cTs >= 0 && st.pTs < 0 && t > st.cTs =>
                  st = st.copy(pTs = t); out += StageChange(uid, 3, e.ts)
                case _ => ()
              }
            }
          state.update(st)
          out.result().iterator
      }
  }
}
