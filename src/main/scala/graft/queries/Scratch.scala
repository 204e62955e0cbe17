package graft.queries

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame

/** Cluster-shape helpers for the query catalog: parallelism is derived
  * from the session (never a literal core count), and multi-leg subtrees
  * are materialized as store-backed temp tables rather than executor
  * caches.
  */
object Scratch {

  /** Partition count for a repartition barrier: the session's default
    * parallelism (32 on the local[32] harness, executors × cores on a
    * cluster). Overridable via `graft.par` for experiments.
    */
  def par(df: DataFrame): Int = {
    val s = df.sparkSession
    s.conf.getOption("graft.par").map(_.toInt)
      .getOrElse(s.sparkContext.defaultParallelism)
  }

  /** Scratch root for materialized subtrees. Defaults under java.io.tmpdir;
    * a deployment points `graft.scratch.dir` at durable shared storage
    * (HDFS/S3) — the cluster-scale requirement an executor-local
    * `.cache()` cannot meet.
    */
  private def scratchRoot(df: DataFrame): String =
    df.sparkSession.conf.getOption("graft.scratch.dir")
      .getOrElse(Paths.get(System.getProperty("java.io.tmpdir"),
        "graft-scratch").toString)

  @volatile private var hookInstalled = false

  private def installCleanup(root: String): Unit = synchronized {
    if (!hookInstalled) {
      hookInstalled = true
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        val p = Paths.get(root)
        if (Files.exists(p)) {
          val walk = Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => { Files.deleteIfExists(f); () })
          catch { case _: Exception => () }
          finally walk.close()
        }
      }))
    }
  }

  /** Materialize a subtree that feeds several join legs: write it once to
    * parquet and re-read. Unlike `.cache()` (executor-memory-resident,
    * lost on executor churn, MEMORY_AND_DISK pressure at scale), the
    * parquet copy is the checkpointed-temp-table shape a 100 TB plan
    * needs — each leg gets an independent columnar scan with its own
    * pushdown, and the subtree's lineage is cut so Spark never re-executes
    * the expensive upstream per leg. Deterministic per-name path +
    * overwrite keeps repeated invocations (bench warm/measured) from
    * accumulating files; a JVM shutdown hook removes the scratch root.
    */
  def materialize(df: DataFrame, name: String): DataFrame = {
    val root = scratchRoot(df)
    installCleanup(root)
    val path = Paths.get(root, name).toString
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
