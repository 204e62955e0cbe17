package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query warm timings.
  *
  * Each query is executed twice: the first run pays whole-stage-codegen
  * compilation + JIT for that plan shape (one-time costs that vanish at
  * cluster scale where a plan runs for minutes), the second is measured.
  * Execution uses the `noop` sink so the full plan — projections included —
  * materializes, unlike `count()` which lets Catalyst prune every column.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      System.err.println(s"[bench] $name ...")
      try {
        exec(name) // warmup: codegen + JIT for this plan shape
        val t0 = System.nanoTime()
        exec(name)
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name $dt%.2fs")
        name -> dt
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        name -> -1.0
      } finally {
        // keep per-query timings independent: drop cached relations and
        // let the JVM compact between plans (35 distinct codegen'd plans
        // otherwise accumulate enough garbage to triple late timings)
        spark.catalog.clearCache()
        System.gc()
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
