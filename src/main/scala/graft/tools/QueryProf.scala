package graft.tools

import graft.{Harness, SparkEntry}
import org.apache.spark.sql.SparkSession

/** One-query profiling harness: runs a catalog entry with
  * `graft.engine.timing` ON so phase-instrumented operators (the
  * GraphRunner commit path, q73's training loop) print wall-time
  * attribution to stderr, warm (1 unmeasured + N measured reps, the
  * Bench discipline).
  *
  * Run: SPARK_GRAFT_ONLY=q73 SPARK_GRAFT_SF_DIR=... \
  *        sbt 'runMain graft.tools.QueryProf'
  */
object QueryProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    // Harness.tuned (r15): profile under the SAME session conf the
    // bench times, or an A/B here attributes a conf diff to the code
    val spark = Harness.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("graft.engine.timing", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_CONF="k=v,k=v": arbitrary runtime conf for experiments
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    val names = Harness.onlyFilter(SparkEntry.queries.keys.toSeq.sorted)
    names.foreach { name =>
      (0 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        System.err.println(
          f"[prof] $name rep$rep total ${(System.nanoTime() - t0) / 1e9}%.3fs")
        Harness.settle(spark)
      }
    }
    spark.stop()
  }
}
