package graft.tools

import graft.{Harness, Tables}
import graft.queries.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase attribution for the decontamination CUT (q104) — the SfxProf
  * discipline applied to the board's steepest remaining 30× slope
  * (17.5 in the r10 single-session ledger): is the cost the OPERATOR
  * (positional gram scan + broadcast probe + cut aggregation) or the
  * HARNESS (the oracle-comparability output sort over full-text rows)?
  *
  * Phases (cumulative pipeline prefixes, each an independent action):
  *   cuts    — eval distinct grams + positional train grams + broadcast
  *             join + per-doc cut-position arrays (integer rows only);
  *   rewrite — + the cutText map producing (doc_id, n_cut, clean_text),
  *             UNSORTED (what a production rewrite writes);
  *   q104    — + the final doc_id sort (the harness cost under test).
  *
  * Run: SCALE_FACTOR=30 sbt 'runMain graft.tools.DecontProf'
  */
object DecontProf {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SCALE_FACTOR", "30").toInt
    val out = s"/tmp/graft_decontprof$factor"
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleSlope.buildCorpus(spark, base, out, factor)

    // the ONE cut-builder spelling (Dedup.decontCuts): the profiler
    // measures exactly the pipeline q104 benchmarks, by construction
    def cutsOf(d: String): DataFrame =
      Dedup.decontCuts(Tables.documents(spark, d))
    def trainOf(d: String): DataFrame =
      Tables.documents(spark, d).filter(col("doc_id") % 10 =!= 3)

    val phases: Seq[(String, String => DataFrame)] = Seq(
      // gram construction alone (no probe): separates the flatMap's
      // string-building cost from the broadcast-join probe
      "grams" -> (d => Dedup.posGramEntries(trainOf(d), Dedup.DecontN)),
      "cuts" -> (d => cutsOf(d)),
      "rewrite" -> (d => Dedup.cutRewrite(trainOf(d), cutsOf(d),
        sorted = false)),
      "q104" -> (d => Dedup.cutRewrite(trainOf(d), cutsOf(d))))

    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Harness.settle(spark)
      dt
    }
    Seq(("1x", base), (s"${factor}x", out)).foreach { case (tag, dir) =>
      phases.foreach { case (name, f) =>
        time(f(dir)) // warmup
        val t = (1 to reps).map(_ => time(f(dir))).min
        System.err.println(f"[decontprof] $tag%-4s $name%-8s $t%7.2fs")
        println(f"$tag $name $t%.3f")
      }
    }
    graft.queries.Scratch.deleteTree(out)
    spark.stop()
  }
}
