package graft.tools

import graft.Tables
import graft.queries.{Dedup, Scratch, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** q130 phase attribution on the replicated corpus (the ContainProf
  * discipline for the line grain): times and sizes each stage of the
  * line-containment pipeline — census, strip+digest index, df agg,
  * probes, candidates, confirm — so a scale knee can be attributed to
  * a stage, not guessed.
  *
  * Run: SCALE_FACTOR=100 sbt 'runMain graft.tools.LineContainProf'
  */
object LineContainProf {
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
        f"[lcprof] $what%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // NOTE: this is the PHASE-SPLIT spelling of
    // TextAnalysis.lineContainmentReport + Dedup.probeContain (the
    // scan/census/strip legs are the SHARED lineRelAndChrome /
    // lineGramIdsOfRel spellings; only the probe tail is unrolled) — a
    // change to the kernel must be mirrored here or the attribution
    // stops describing the entry (the r10 DecontProf lesson).
    // History: the first shape ran the exploded pageLines HOF chain
    // TWICE (separate census and index consumers) — this harness
    // attributed 39 s + 48 s of the 108 s total at 100× to those two
    // scans, which drove the one-materialized-line-relation rewrite.
    val pd = TextAnalysis.pageDocs(
      TextAnalysis.withQuotes(Tables.documents(spark, out)))
    val (li, chrome) = timed("lines+census-mat")(
      TextAnalysis.lineRelAndChrome(pd, "lcprof"))
    val g = timed("index-materialize")(Scratch.materialize(
      TextAnalysis.lineGramIdsOfRel(li, chrome), "lcprof_lines")
      .toDF("doc_id", "gid"))
    System.err.println(s"[lcprof] |g| = ${timed("g-count")(g.count())}")
    val sizes = g.groupBy(col("doc_id")).agg(count(lit(1)).as("ng"))
    val dfs = g.groupBy(col("gid")).agg(count(lit(1)).as("df"))
    System.err.println(s"[lcprof] |dfs| = ${timed("df-agg")(dfs.count())}")
    val win = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("gid"))
    val probes = Scratch.materialize(
      g.join(dfs, "gid")
        .withColumn("rk", row_number().over(win))
        .where(col("rk") <= Dedup.ContainProbes &&
          col("df") <= Dedup.ContainDfCapDefault)
        .select(col("doc_id").as("d"), col("gid")),
      "lcprof_probes").toDF("d", "gid")
    System.err.println(s"[lcprof] |probes| = ${timed("probes")(probes.count())}")
    val cand = Scratch.materialize(
      probes.join(g.select(col("gid"), col("doc_id").as("c")), "gid")
        .where(col("d") =!= col("c"))
        .select(col("d"), col("c")).distinct()
        .join(sizes.select(col("doc_id").as("d"), col("ng").as("nd")), "d")
        .join(sizes.select(col("doc_id").as("c"), col("ng").as("nc")), "c")
        .where(col("nc") > col("nd"))
        .select(col("d"), col("c"), col("nd")),
      "lcprof_cand").toDF("d", "c", "nd")
    System.err.println(s"[lcprof] |cand| = ${timed("candidates")(cand.count())}")
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
    System.err.println(s"[lcprof] |report| = ${timed("confirm")(confirm.count())}")
    Scratch.deleteTree(out)
    spark.stop()
  }
}
