package graft.tools

import graft.{Harness, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Dev-only q59 narrow-loop identity check: dump the kmeans-family
  * outputs (q59/q85/q88/q96) under an explicit `graft.q59.par` so the
  * narrow-loop width's before/after rows can be diffed bit-for-bit.
  *
  * Run: sbt 'runMain graft.tools.KmCheck <sfDir> <outDir> <par>'
  */
object KmCheck {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, par) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Harness.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("graft.q59.par", par))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    Seq("q59_kmeans_train", "q85_kmeans_certificate", "q88_ann_ivf_trained",
      "q96_ann_certificate").foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      Harness.settle(spark, blocking = false)
    }
    spark.stop()
  }
}
