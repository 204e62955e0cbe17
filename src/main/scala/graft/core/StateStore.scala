package graft.core

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max, min}
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** Segment-log table store with an atomically-swapped manifest — the
  * Spark-native analogue of the reference's transactional unit-of-work
  * (SURVEY.md T3: `EfBlockUnitOfWork.CommitAsync:94-121`): one commit
  * persists every reducer's rows AND every reducer's checkpoint; a crash
  * before the manifest swap leaves the previous state fully intact.
  *
  * Design (the 100 TB story):
  *  - every table is an append-only list of parquet *segments*, each
  *    carrying min/max-slot stats in the manifest — the analogue of the
  *    reference's `HasIndex(SpentSlot)`/slot indexes (P9) and of
  *    Delta-style file stats. Appends never rewrite existing data.
  *  - retraction (`DELETE WHERE slot >= s`, reference T5/O3) drops whole
  *    segments whose minSlot >= s and rewrites only segments straddling
  *    s — work proportional to the reorg depth, not the table size.
  *  - "resurrect" (un-spend, reference `LovelaceBalanceByAddressReducer
  *    .cs:115-127`) never exists as a row update here: spends are
  *    slot-keyed *events* in their own table, so rolling back a spend is
  *    the same segment-pruned delete. No row is ever updated in place.
  *  - idempotent replay (T3): a commit whose batchId is not newer than
  *    the manifest's is a no-op, so at-least-once delivery is safe.
  *  - crash mid-commit: segment files may be orphaned but are
  *    unreferenced; the next commit with the same batchId overwrites the
  *    same segment paths (ids are allocated from the manifest).
  */
final class StateStore(root: String, spark: SparkSession,
    maxSegments: Int = 8) {

  final case class Segment(id: Long, minSlot: Long, maxSlot: Long)

  final case class Manifest(
      batchId: Long,
      nextSegId: Long,
      tables: Map[String, Seq[Segment]],
      checkpoints: Map[String, Seq[Point]])

  private val manifestPath = Paths.get(root, "manifest.properties")

  Files.createDirectories(Paths.get(root, "tables"))

  def manifest: Manifest = {
    if (!Files.exists(manifestPath)) return Manifest(-1L, 0L, Map.empty, Map.empty)
    val p = new Properties()
    val in = Files.newInputStream(manifestPath)
    try p.load(in) finally in.close()
    val keys = p.stringPropertyNames().asScala
    val tables = keys.filter(_.startsWith("table.")).map { k =>
      val name = k.stripPrefix("table.")
      val segs = p.getProperty(k).split(",").filter(_.nonEmpty).toSeq.map { s =>
        val Array(id, lo, hi) = s.split(":")
        Segment(id.toLong, lo.toLong, hi.toLong)
      }
      name -> segs
    }.toMap
    val cps = keys.filter(_.startsWith("checkpoint.")).map { k =>
      val name = k.stripPrefix("checkpoint.")
      val pts = p.getProperty(k).split(",").filter(_.nonEmpty).toSeq.map { s =>
        val Array(h, sl) = s.split(":")
        Point(h, sl.toLong)
      }
      name -> pts
    }.toMap
    Manifest(p.getProperty("batchId", "-1").toLong,
      p.getProperty("nextSegId", "0").toLong, tables, cps)
  }

  private def writeManifest(m: Manifest): Unit = {
    val p = new Properties()
    p.setProperty("batchId", m.batchId.toString)
    p.setProperty("nextSegId", m.nextSegId.toString)
    m.tables.foreach { case (t, segs) =>
      p.setProperty(s"table.$t",
        segs.map(s => s"${s.id}:${s.minSlot}:${s.maxSlot}").mkString(","))
    }
    m.checkpoints.foreach { case (r, pts) =>
      p.setProperty(s"checkpoint.$r",
        pts.map(pt => s"${pt.hash}:${pt.slot}").mkString(","))
    }
    val tmp = Paths.get(root, s"manifest.tmp")
    val out = Files.newOutputStream(tmp)
    try p.store(out, null) finally out.close()
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def segPath(table: String, id: Long): String =
    Paths.get(root, "tables", table, s"seg-$id").toString

  /** Current contents of a table (empty DF with `schema` if absent). */
  def read(table: String, schema: StructType): DataFrame = {
    val segs = manifest.tables.getOrElse(table, Seq.empty)
    if (segs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).parquet(segs.map(s => segPath(table, s.id)): _*)
  }

  /** Atomically commit appends + checkpoints as batch `batchId`.
    * Returns false without touching the manifest when
    *  - `batchId` is not newer than the manifest's (idempotent-replay
    *    guard, reference T3), or
    *  - every append is empty (empty-commit deferral, reference T4:
    *    `EfBlockUnitOfWork.cs:101-112` — the caller carries the
    *    checkpoints forward to the next data-bearing commit).
    */
  def commit(batchId: Long, appends: Map[String, (DataFrame, String)],
      checkpoints: Map[String, Seq[Point]]): Boolean = {
    val m = manifest
    if (batchId <= m.batchId) return false
    var nextId = m.nextSegId
    var tables = m.tables
    var wroteAny = false
    appends.foreach { case (table, (df, slotCol)) =>
      val cached = df.cache()
      try {
        val stats = cached.agg(
          min(col(slotCol)).as("lo"), max(col(slotCol)).as("hi")).head()
        if (!stats.isNullAt(0)) { // non-empty append
          val id = nextId; nextId += 1
          cached.write.mode("overwrite").parquet(segPath(table, id))
          tables = tables.updated(table,
            tables.getOrElse(table, Seq.empty) :+
              Segment(id, stats.getLong(0), stats.getLong(1)))
          wroteAny = true
        }
      } finally cached.unpersist()
    }
    if (!wroteAny) return false
    // Compaction: a table's segment list would otherwise grow by one per
    // commit, making every state read an ever-wider union (measured as
    // per-batch cost growth in ChainPerf). Fold the OLDEST segments into
    // one, keeping the newest few separate so retraction of a shallow
    // reorg still drops whole recent segments instead of rewriting the
    // merged bulk. The merged segment enters the same manifest swap, so
    // compaction is atomic with the commit and replay-safe.
    val keepRecent = math.max(2, maxSegments / 2)
    tables = tables.map { case (table, segs) =>
      if (segs.size <= maxSegments) table -> segs
      else {
        val (old, recent) = segs.splitAt(segs.size - keepRecent)
        val merged = spark.read
          .parquet(old.map(s => segPath(table, s.id)): _*)
        val id = nextId; nextId += 1
        merged.write.mode("overwrite").parquet(segPath(table, id))
        table -> (Segment(id, old.map(_.minSlot).min, old.map(_.maxSlot).max)
          +: recent)
      }
    }
    writeManifest(Manifest(batchId, nextId, tables, m.checkpoints ++ checkpoints))
    true
  }

  /** Retraction: `DELETE WHERE slot >= delSlot` on every table, segment-
    * pruned (reference T5: `ReducerGraphProcessor.cs:176-209`). Always
    * commits (rollback checkpoints are never deferred, T4).
    */
  def rollback(delSlot: Long, slotCols: Map[String, String],
      checkpoints: Map[String, Seq[Point]]): Unit = {
    val m = manifest
    var nextId = m.nextSegId
    val tables = m.tables.map { case (table, segs) =>
      val slotCol = slotCols.getOrElse(table, "slot")
      val kept = segs.filter(_.maxSlot < delSlot)
      val straddling = segs.filter(s => s.minSlot < delSlot && s.maxSlot >= delSlot)
      val rewritten = straddling.flatMap { s =>
        val df = spark.read.parquet(segPath(table, s.id))
          .filter(col(slotCol) < delSlot)
          .cache()
        try {
          val stats = df.agg(
            min(col(slotCol)).as("lo"), max(col(slotCol)).as("hi")).head()
          if (stats.isNullAt(0)) None // segment fully retracted
          else {
            val id = nextId; nextId += 1
            df.write.mode("overwrite").parquet(segPath(table, id))
            Some(Segment(id, stats.getLong(0), stats.getLong(1)))
          }
        } finally df.unpersist()
      }
      table -> (kept ++ rewritten)
    }
    writeManifest(Manifest(m.batchId + 1, nextId, tables,
      m.checkpoints ++ checkpoints))
  }
}
