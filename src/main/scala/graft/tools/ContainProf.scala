package graft.tools

import graft.Tables
import graft.queries.{Dedup, Scratch}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** q127 phase attribution on the replicated corpus: times and sizes
  * each stage of the containment pipeline separately so a scale knee
  * can be attributed to a stage, not guessed.
  *
  * Run: SCALE_FACTOR=100 sbt 'runMain graft.tools.ContainProf'
  */
object ContainProf {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SCALE_FACTOR", "100").toInt
    val out = s"/tmp/graft_scale$factor"
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleSlope.buildCorpus(spark, base, out, factor)

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[cprof] $what%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // NOTE: this is the PHASE-SPLIT spelling of Dedup.probeContain /
    // buildContainIndex (the gram projection is the shared gramIds) —
    // a change to the kernel must be mirrored here or the attribution
    // stops describing the entry (the r10 DecontProf lesson).
    val corpus = Dedup.withSnippets(Tables.documents(spark, out))
    val g = timed("grams-materialize")(Scratch.materialize(
      Dedup.gramIds(corpus), "cprof_grams").toDF("doc_id", "gid"))
    System.err.println(s"[cprof] |g| = ${timed("g-count")(g.count())}")
    val sizes = g.groupBy(col("doc_id")).agg(count(lit(1)).as("ng"))
    val dfs = g.groupBy(col("gid")).agg(count(lit(1)).as("df"))
    System.err.println(s"[cprof] |dfs| = ${timed("df-agg")(dfs.count())}")
    val win = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("gid"))
    val probes = Scratch.materialize(
      g.join(dfs, "gid")
        .withColumn("rk", row_number().over(win))
        // the entry's df cap too (r12 advice): without it the profiler
        // measures a larger probe set / candidate fan-out than q127
        // executes — the kernel-drift failure the NOTE above warns about
        .where(col("rk") <= Dedup.ContainProbes &&
          col("df") <= Dedup.ContainDfCapDefault)
        .select(col("doc_id").as("d"), col("gid")),
      "cprof_probes").toDF("d", "gid")
    System.err.println(s"[cprof] |probes| = ${timed("probes")(probes.count())}")
    val cand = Scratch.materialize(
      probes.join(g.select(col("gid"), col("doc_id").as("c")), "gid")
        .where(col("d") =!= col("c"))
        .select(col("d"), col("c")).distinct()
        .join(sizes.select(col("doc_id").as("d"), col("ng").as("nd")), "d")
        .join(sizes.select(col("doc_id").as("c"), col("ng").as("nc")), "c")
        .where(col("nc") > col("nd"))
        .select(col("d"), col("c"), col("nd")),
      "cprof_cand").toDF("d", "c", "nd")
    System.err.println(s"[cprof] |cand| = ${timed("candidates")(cand.count())}")
    // candidate-bounded confirm — the entry's shape (the un-bounded
    // spelling re-shuffled the full gram table twice: measured 98 s of
    // 213 at 100×)
    val dIds = broadcast(cand.select(col("d").as("doc_id")).distinct())
    val cIds = broadcast(cand.select(col("c").as("doc_id")).distinct())
    val gd = g.join(dIds, Seq("doc_id"), "left_semi")
    val gc = g.join(cIds, Seq("doc_id"), "left_semi")
    val confirm = cand
      .join(gd.select(col("doc_id").as("d"), col("gid")), "d")
      .join(gc.select(col("doc_id").as("c"), col("gid")),
        Seq("c", "gid"), "left_semi")
      .groupBy(col("d"), col("c"), col("nd"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared").cast("double") / col("nd") >= Dedup.ContainTau)
    System.err.println(s"[cprof] |report| = ${timed("confirm")(confirm.count())}")
    Scratch.deleteTree(out)
    spark.stop()
  }
}
