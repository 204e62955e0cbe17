package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Dependency-graph batch runner — the Spark re-expression of the
  * reference's `CardanoIndexWorker` + `ReducerGraphProcessor`
  * (SURVEY.md T1-T12, §3).
  *
  * Differences by design (Spark-first, not a port):
  *  - reducers run in topological order once per MICRO-BATCH, set-based,
  *    instead of once per block — within-batch visibility (reference T2's
  *    per-block flush) is provided by DataFrame lineage (`BatchContext
  *    .parentOutput`) and by chain validity (an input only spends an
  *    output created no later than itself, so set-based spend matching
  *    over the whole batch equals the per-block fold).
  *  - data parallelism comes from Spark partitioning inside each stage
  *    (the reference is deliberately sequential, P11 — its bottleneck is
  *    fsync, ours is the cluster).
  */
final class GraphRunner(
    val spark: SparkSession,
    val store: StateStore,
    reducers: Seq[ChainReducer],
    batchSize: Int = 500,
    maxRollbackSlots: Long = 10000L) {

  require(reducers.nonEmpty, "no reducers registered")

  private val byName = reducers.map(r => r.name -> r).toMap

  // ---- graph validation (reference ReducerExtension.cs:110-124,
  // CardanoIndexWorker.DependencyGraph.cs:8-51) ----
  reducers.foreach { r =>
    r.dependsOn.foreach { d =>
      require(byName.contains(d), s"reducer ${r.name} depends on missing $d")
      require(d != r.name, s"reducer ${r.name} depends on itself")
      require(byName(d).dependsOn != Some(r.name),
        s"dependency cycle between ${r.name} and $d")
    }
  }

  /** BFS order from roots — valid topologically because each node has at
    * most one parent (reference P10, `DependencyGraph.cs:75-96`).
    */
  val topoOrder: Seq[ChainReducer] = {
    val children = reducers.groupBy(_.dependsOn)
    val order = mutable.ArrayBuffer[ChainReducer]()
    val queue = mutable.Queue[ChainReducer](
      children.getOrElse(None, Seq.empty).sortBy(_.name): _*)
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      order += r
      queue.enqueueAll(
        children.getOrElse(Some(r.name), Seq.empty).sortBy(_.name))
    }
    require(order.size == reducers.size, "disconnected dependency graph")
    order.toSeq
  }

  private val tableDefs: Map[String, TableDef] =
    reducers.flatMap(_.tables).map(t => t.name -> t).toMap
  private val slotCols: Map[String, String] =
    tableDefs.map { case (n, d) => n -> d.slotCol }

  /** Checkpoint points deferred by empty commits (reference T4 carry-
    * forward, `ReducerGraphProcessor.cs:222-249`) — in-memory only, like
    * the reference's tracked intersections.
    */
  private var pendingPoints: Map[String, Seq[Point]] = Map.empty

  def latestCheckpointSlot: Long =
    store.manifest.checkpoints.values
      .flatMap(CheckpointWindow.latest).map(_.slot)
      .minOption.getOrElse(-1L)

  /** Process an event sequence: accumulate roll-forwards, flush on batch
    * size (T1 trigger a), on rollback (T5: commit open batch first — the
    * pre-fork blocks are valid), and on drain (T1 trigger c).
    */
  def processEvents(events: Iterable[BlockEvent]): Unit = {
    val open = mutable.ArrayBuffer[Block]()
    events.foreach {
      case RollForward(b) =>
        open += b
        if (open.size >= batchSize) { flush(open.toSeq); open.clear() }
      case RollBack(point, mode) =>
        flush(open.toSeq); open.clear()
        applyRollback(point, mode)
    }
    flush(open.toSeq)
  }

  /** One micro-batch: run reducers in topo order, commit all appends +
    * all checkpoints atomically (T3), defer empty commits (T4).
    */
  def flush(blocks: Seq[Block]): Unit = {
    if (blocks.isEmpty) return
    val batchId = store.manifest.batchId + 1
    import spark.implicits._
    val blocksDf = blocks.toDS().toDF().cache()
    try {
      val ctx = new BatchContext(spark, store, tableDefs, Map.empty)
      val appends = mutable.LinkedHashMap[String, (DataFrame, String)]()
      topoOrder.foreach { r =>
        val out = r.rollForward(blocksDf, ctx)
        ctx.outputs = ctx.outputs.updated(r.name, out)
        out.foreach { case (t, df) => appends(t) = (df, slotCols(t)) }
      }
      // checkpoint window advances through every block of the batch
      val m = store.manifest
      val newCps = topoOrder.map { r =>
        val prior = pendingPoints.getOrElse(r.name,
          m.checkpoints.getOrElse(r.name, Seq.empty))
        r.name -> blocks.foldLeft(prior)((w, b) =>
          CheckpointWindow.addRollForward(w, Point(b.hash, b.slot)))
      }.toMap
      val wrote = store.commit(batchId, appends.toMap, newCps)
      if (wrote) pendingPoints = Map.empty
      else pendingPoints = newCps // deferred or replayed: carry forward
    } finally blocksDf.unpersist()
  }

  /** Retraction (T5/T6): normalize Exclusive ⇒ delete >= slot+1
    * (`ReducerGraphProcessor.cs:178-183`), guard depth
    * (`CardanoIndexWorker.cs:229-247`), roll every reducer back, commit
    * immediately (never deferred).
    */
  def applyRollback(point: Point, mode: RollbackMode): Unit = {
    val delSlot = mode match {
      case Inclusive => point.slot
      case Exclusive => point.slot + 1
    }
    val current = store.manifest.checkpoints.values
      .flatMap(CheckpointWindow.latest).map(_.slot).maxOption.getOrElse(-1L)
    require(current < 0 || current - delSlot < maxRollbackSlots,
      s"rollback to $delSlot exceeds MaxRollbackSlots=$maxRollbackSlots " +
        s"behind current $current")
    val m = store.manifest
    val newCps = reducers.map { r =>
      val prior = pendingPoints.getOrElse(r.name,
        m.checkpoints.getOrElse(r.name, Seq.empty))
      r.name -> CheckpointWindow.applyRollback(prior, delSlot)
    }.toMap
    store.rollback(delSlot, slotCols, newCps)
    pendingPoints = Map.empty
  }

  /** Startup reconciliation (T9/T10 + §3.3): the safe resume point is the
    * MINIMUM of every reducer's latest checkpoint (so no dependent misses
    * blocks), and resuming begins with a rollback to it — mirroring the
    * protocol's initial RollBackward, which trims any rows orphaned by a
    * crash after their checkpoint (`WorkerCrashRecoveryTest.cs:21-37`).
    */
  def resume(events: Iterable[BlockEvent]): Unit = {
    val safe = latestCheckpointSlot
    if (safe >= 0) applyRollback(Point("resume", safe), Exclusive)
    processEvents(events.filter {
      case RollForward(b) => b.slot > safe
      case _ => true
    })
  }
}
