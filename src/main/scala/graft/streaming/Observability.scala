package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Observability (SURVEY.md §2.12) — the reference's dashboard/telemetry
  * surface re-expressed as a queryable progress table:
  *  - progress %% per reducer with the reference's formula
  *    `(current − start) / (tip − start)`, dependents inheriting the
  *    root's progress recursively (`CardanoIndexWorker.Dashboard
  *    .cs:318-355`);
  *  - per-reducer processing-time means over a sliding buffer
  *    (`CardanoIndexWorker.Telemetry.cs:9-110`);
  *  - the effective tip = max slot processed by any reducer, merged with
  *    the provider tip when known (`Telemetry.cs:14-17`).
  */
final case class ReducerProgress(
    reducer: String,
    startSlot: Long,
    currentSlot: Long,
    tipSlot: Long,
    progressPct: Double,
    batches: Long,
    meanBatchSec: Double)

final class Telemetry(
    reducerDependency: Map[String, Option[String]],
    startSlots: Map[String, Long] = Map.empty,
    bufferSize: Int = 32) {
  require(bufferSize > 0,
    s"bufferSize must be positive, got $bufferSize: 0 silently disables " +
      "the timing window and a negative value throws in the listener")


  // acyclic by construction: progressPct recurses parent links, and a
  // cycle (or self-reference) in a caller-built map would otherwise
  // StackOverflowError inside the telemetry lock (r07 review) —
  // GraphRunner validates ITS graphs, but Telemetry is also built
  // directly (Dashboard)
  locally {
    reducerDependency.keys.foreach { k =>
      var seen = Set.empty[String]
      var cur: Option[String] = Some(k)
      while (cur.isDefined) {
        val c = cur.get
        require(!seen.contains(c),
          s"cyclic reducer dependency through '$c'")
        seen += c
        cur = reducerDependency.getOrElse(c, None)
      }
    }
  }

  private val timings = mutable.Map[String, mutable.Queue[Double]]()
  private val batchCounts = mutable.Map[String, Long]().withDefaultValue(0L)
  private val latestSlots = mutable.Map[String, Long]()
  private var effectiveTip: Long = -1L

  /** Streaming-side batch log fed by the query listener — BOUNDED (last
    * `bufferSize * 32` entries) so a long-running stream cannot grow
    * driver memory without limit.
    */
  private val streamBatchLog: mutable.ArrayBuffer[(Long, Long, Double)] =
    mutable.ArrayBuffer.empty // (batchId, numInputRows, procSec)

  def recordStreamBatch(batchId: Long, rows: Long, procSec: Double): Unit =
    streamBatchLog.synchronized {
      streamBatchLog += ((batchId, rows, procSec))
      if (streamBatchLog.size > bufferSize * 32)
        streamBatchLog.remove(0, streamBatchLog.size - bufferSize * 32)
    }

  /** Immutable snapshot — the ONE read surface. The buffer itself is
    * private: a live reader iterating while the listener thread
    * appends/compacts would see torn state (every other Telemetry
    * surface is lock-safe; this was the one racy field — r07 review).
    */
  def streamBatches: Seq[(Long, Long, Double)] =
    streamBatchLog.synchronized { streamBatchLog.toVector }

  /** Record one reducer's batch work (reference `RecordTelemetry`). */
  def record(reducer: String, elapsedSec: Double, slot: Long): Unit =
    synchronized {
      val q = timings.getOrElseUpdate(reducer, mutable.Queue.empty)
      q.enqueue(elapsedSec)
      while (q.size > bufferSize) q.dequeue()
      batchCounts(reducer) = batchCounts(reducer) + 1
      latestSlots(reducer) = math.max(latestSlots.getOrElse(reducer, -1L), slot)
      effectiveTip = math.max(effectiveTip, slot)
    }

  def observeTip(tipSlot: Long): Unit =
    synchronized { effectiveTip = math.max(effectiveTip, tipSlot) }

  /** Slot-only observation for pollers that READ state rather than do
    * batch work (Dashboard's store-polling mode): advances progress
    * without fabricating batch counts or zero timings — polling via
    * record(r, 0.0, slot) made the rendered table claim one
    * instantaneous batch per refresh (r07 review).
    */
  def observeSlot(reducer: String, slot: Long): Unit =
    synchronized {
      latestSlots(reducer) =
        math.max(latestSlots.getOrElse(reducer, -1L), slot)
      effectiveTip = math.max(effectiveTip, slot)
    }

  /** Port of `CalculateReducerProgress` (Dashboard.cs:318-355):
    * dependents inherit the root's progress recursively; roots report
    * `(current − start) / (tip − start)`, clamped to 99.99 unless
    * actually at tip.
    */
  def progressPct(reducer: String): Double = synchronized {
    reducerDependency.getOrElse(reducer, None) match {
      case Some(parent) if reducerDependency.contains(parent) =>
        progressPct(parent)
      case _ =>
        val start = startSlots.getOrElse(reducer, -1L)
        val current = latestSlots.getOrElse(reducer, start)
        if (effectiveTip < 0) 0.0 // no tip observed yet (fresh store)
        else if (effectiveTip <= start) 100.0
        else if (current >= effectiveTip) 100.0
        else {
          val total = (effectiveTip - start).toDouble
          val synced = math.max(0L, current - start).toDouble
          math.min(synced / total * 100.0, 99.99)
        }
    }
  }

  def snapshot: Seq[ReducerProgress] = synchronized {
    reducerDependency.keys.toSeq.sorted.map { r =>
      val ts = timings.getOrElse(r, mutable.Queue.empty)
      ReducerProgress(
        reducer = r,
        startSlot = startSlots.getOrElse(r, -1L),
        currentSlot = latestSlots.getOrElse(r, -1L),
        tipSlot = effectiveTip,
        progressPct = progressPct(r),
        batches = batchCounts(r),
        meanBatchSec = if (ts.isEmpty) 0.0 else ts.sum / ts.size)
    }
  }

  /** The progress table (queryable like any other engine table). */
  def progressDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshot.toDF()
  }
}
