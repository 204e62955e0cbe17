package graft.tools

import graft.SparkEntry
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev-only plan audit: dump `explain("formatted")` for every catalog
  * query so pushdown (PushedFilters/ReadSchema), join strategy
  * (BroadcastHashJoin vs SortMergeJoin) and WholeStageCodegen spans can
  * be reviewed without executing anything.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "/tmp/plans"
    // Harness.tuned: dumped plans reflect the SAME session conf the
    // bench/verify sessions plan under (r14 — the SHJ baseline)
    val spark = graft.Harness.tuned(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"$name.txt"), plan)
      } catch {
        case e: Throwable =>
          Files.writeString(Paths.get(outDir, s"$name.ERROR.txt"), e.toString)
      }
    }
    spark.stop()
  }
}
