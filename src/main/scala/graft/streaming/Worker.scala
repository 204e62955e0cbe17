package graft.streaming

import graft.core.GraphRunner
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import scala.collection.mutable

/** Multi-root orchestration — the analogue of the reference's worker
  * run loop (`CardanoIndexWorker.cs:99-102,137-159`): one ingestion
  * pipeline per root reducer graph, all started up front (each
  * `ChainIngest.start` acquires its store's single-writer lock before
  * any block flows, T13), then awaited together with FAIL-FAST
  * semantics — the first faulting root stops every other root and its
  * exception is rethrown, so a reducer error can never be masked as a
  * clean exit (the reference's WhenAny/IsFaulted loop).
  *
  * Roots are independent stores/checkpoints by construction (the
  * documented one-runner-per-root model, GraphRunner.scala), so the
  * only shared resource is the SparkSession's scheduler — queries run
  * concurrently as Structured Streaming jobs.
  */
object Worker {

  /** One root graph: where its blocks appear, where its stream
    * checkpoint lives, and the runner that owns its store. `telemetry`
    * (one instance per root, also passed to the root's GraphRunner)
    * feeds the per-root progress rows on [[Handle.progress]].
    */
  final case class Root(
      blocksDir: String,
      checkpointDir: String,
      runner: GraphRunner,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None,
      telemetry: Option[Telemetry] = None)

  /** A running worker. `await()` is the reference's WhenAll loop (wait
    * for ALL roots — one root finishing must not tear down the others,
    * `WorkerShutdownSemanticsTest.cs:56`); `requestStop()` is its
    * graceful StopAsync (stop every root's query; `await` then returns
    * cleanly rather than throwing); `progress` surfaces each root's
    * reducer progress rows while the worker runs.
    */
  final class Handle private[Worker] (
      queries: Seq[(Root, StreamingQuery)], pollMs: Long,
      workerTelemetry: Option[Telemetry] = None) {
    @volatile private var stopping = false

    /** Graceful shutdown: stop every root (drain the in-flight batch,
      * release locks). Safe to call more than once / concurrently with
      * `await`.
      */
    def requestStop(): Unit = {
      stopping = true
      stopAll(queries.map(_._2))
    }

    def isStopRequested: Boolean = stopping

    /** True while any root's query is still active. */
    def isActive: Boolean = queries.exists(_._2.isActive)

    /** Per-root progress rows, keyed by the root's store root — live
      * tip-distance observability under `ProcessingTime` triggers (the
      * reference's dashboard surface, per root). Roots started without
      * telemetry report empty.
      */
    def progress: Map[String, Seq[ReducerProgress]] =
      queries.map { case (r, _) =>
        // same fallback chain as start(): a root without its own
        // telemetry reports through the worker-level instance. That
        // instance is SHARED across such roots, so its snapshot is
        // filtered to the root's own reducers — otherwise every root
        // would report the full worker-wide row set and a caller
        // summing per-root rows would double-count.
        r.runner.store.root -> r.telemetry.orElse(workerTelemetry)
          .fold(Seq.empty[ReducerProgress])(
            _.snapshot.filter(p => r.runner.reducerNames.contains(p.reducer)))
      }.toMap

    /** Wait for EVERY root to terminate (WhenAll). Throws the first
      * root FAILURE after stopping the others (fail-fast, no masked
      * exit); returns normally when all roots finished cleanly —
      * including via `requestStop()`.
      */
    def await(): Unit = {
      val started = queries.map(_._2)
      val pending = mutable.Set[java.util.UUID](started.map(_.id): _*)
      while (pending.nonEmpty) {
        started.filter(q => pending.contains(q.id) && !q.isActive).foreach { q =>
          pending -= q.id
          q.exception.foreach { e =>
            stopAll(started) // fail fast: cancel the healthy roots
            throw Option(e.cause).getOrElse(e)
          }
        }
        if (pending.nonEmpty) Thread.sleep(pollMs)
      }
    }
  }

  /** Start every root and return a [[Handle]] (locks acquired before any
    * block flows; a root that cannot start stops the already-started
    * ones and throws).
    */
  def start(spark: SparkSession, roots: Seq[Root],
      telemetry: Option[Telemetry] = None, pollMs: Long = 50L): Handle = {
    require(roots.nonEmpty, "no roots to run")
    // paths compare NORMALIZED (r08 review): "/a/ck" vs "/a/ck/" or a
    // relative spelling of the same directory would slip past a raw
    // string distinct and recreate exactly the shared-checkpoint /
    // shared-store corruption these guards exist to prevent
    def norm(p: String): String =
      java.nio.file.Paths.get(p).toAbsolutePath.normalize.toString
    require(roots.map(r => norm(r.runner.store.root)).distinct.size
      == roots.size,
      "multi-root worker requires one distinct store per root (T13)")
    // a shared stream checkpoint is as fatal as a shared store: the
    // second root would resume from the first's file-source offset log
    // and silently skip its own blocks
    require(roots.map(r => norm(r.checkpointDir)).distinct.size
      == roots.size,
      "multi-root worker requires one distinct checkpointDir per root")
    // the worker-level telemetry fallback keys rows by REDUCER NAME:
    // two roots without their own instance running same-named reducers
    // would interleave slots/timings under one key — progress rows that
    // LOOK right (the name filter passes) while carrying the other
    // chain's values. Reject the configuration loudly; per-root
    // Telemetry instances attribute correctly.
    // group by the EFFECTIVE instance: roots that explicitly share one
    // Telemetry bypass a fallback-only check (r07 review) — the
    // mis-attribution is a property of the shared INSTANCE, however it
    // was shared
    roots.groupBy(r => r.telemetry.orElse(telemetry)).foreach {
      case (Some(_), rs) if rs.size > 1 =>
        // ANY shared instance across roots is rejected, not just
        // same-named reducers (r08 review): effectiveTip is
        // instance-global, so two chains sharing one Telemetry
        // cross-contaminate tipSlot/progressPct even with disjoint
        // reducer names — the slower chain reports the faster chain's
        // tip and never reaches 100%. A dashboard wanting a combined
        // view aggregates per-root instances instead.
        require(rs.size <= 1,
          s"${rs.size} roots share one Telemetry instance: tip/progress " +
            "attribution is per-instance — give each root its own")
      case _ => ()
    }
    val started = mutable.ArrayBuffer[(Root, StreamingQuery)]()
    try
      roots.foreach { r =>
        started += r -> ChainIngest.start(spark, r.blocksDir, r.checkpointDir,
          r.runner, r.trigger, r.maxFilesPerTrigger,
          telemetry = r.telemetry.orElse(telemetry))
      }
    catch { // a root that cannot start (e.g. held lock) fails the worker
      case e: Throwable => stopAll(started.map(_._2)); throw e
    }
    new Handle(started.toSeq, pollMs, telemetry)
  }

  /** Run every root to completion (with `AvailableNow`: drain-then-stop;
    * with `ProcessingTime`: until failure or external stop). Throws the
    * FIRST root failure after stopping the others; returns normally only
    * when every root's query terminated cleanly.
    */
  def run(spark: SparkSession, roots: Seq[Root],
      telemetry: Option[Telemetry] = None, pollMs: Long = 50L): Unit =
    start(spark, roots, telemetry, pollMs).await()

  private def stopAll(qs: Iterable[StreamingQuery]): Unit =
    qs.foreach(q => try q.stop() catch { case _: Exception => () })
}
