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
    * checkpoint lives, and the runner that owns its store.
    */
  final case class Root(
      blocksDir: String,
      checkpointDir: String,
      runner: GraphRunner,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None)

  /** Run every root to completion (with `AvailableNow`: drain-then-stop;
    * with `ProcessingTime`: until failure or external stop). Throws the
    * FIRST root failure after stopping the others; returns normally only
    * when every root's query terminated cleanly.
    */
  def run(spark: SparkSession, roots: Seq[Root],
      telemetry: Option[Telemetry] = None, pollMs: Long = 50L): Unit = {
    require(roots.nonEmpty, "no roots to run")
    require(roots.map(_.runner.store.root).distinct.size == roots.size,
      "multi-root worker requires one distinct store per root (T13)")
    val started = mutable.ArrayBuffer[StreamingQuery]()
    try
      roots.foreach { r =>
        started += ChainIngest.start(spark, r.blocksDir, r.checkpointDir,
          r.runner, r.trigger, r.maxFilesPerTrigger, telemetry = telemetry)
      }
    catch { // a root that cannot start (e.g. held lock) fails the worker
      case e: Throwable => stopAll(started); throw e
    }
    val pending = mutable.Set[java.util.UUID](started.map(_.id).toSeq: _*)
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

  private def stopAll(qs: Iterable[StreamingQuery]): Unit =
    qs.foreach(q => try q.stop() catch { case _: Exception => () })
}
