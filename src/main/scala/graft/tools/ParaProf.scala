package graft.tools

import graft.queries.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off phase attribution for q118's scale slope (the PiiProf
  * discipline): times the line-digest explode, winner election, drop
  * aggregation, and the full rewrite separately over the scaled
  * corpus, so run-to-run variance can be pinned to a stage.
  *
  * Run: SCALE_FACTOR=30 sbt 'runMain graft.tools.ParaProf'
  */
object ParaProf {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SCALE_FACTOR", "30").toInt
    val out = s"/tmp/graft_piiprof$factor" // share PiiProf's corpus
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    if (!new java.io.File(s"$out/documents.parquet").exists())
      ScaleSlope.buildCorpus(spark, base, out, factor)

    val docs = spark.read.parquet(s"$out/documents.parquet")
    def pd: DataFrame = TextAnalysis.pageDocs(docs)
    def li: DataFrame = TextAnalysis.lineIdxDigests(pd)

    def time(name: String)(df: => DataFrame): Unit = {
      (0 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        System.err.println(
          f"[paraprof] $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
    }

    time("lineIdxDigests")(li)
    val winners = li.groupBy(col("lmd5"))
      .agg(min(struct(col("doc_id"), col("line_idx"))).as("w"))
    time("winners")(winners)
    val drops = li.join(winners, "lmd5")
      .where(col("doc_id") =!= col("w.doc_id") ||
        col("line_idx") =!= col("w.line_idx"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("line_idx")).as("didx"))
    time("drops")(drops)
    time("full q118 (no sort)")(TextAnalysis.paragraphDedup(docs))
    time("full q118 (sorted)")(
      TextAnalysis.paragraphDedup(docs).orderBy(col("doc_id")))
    spark.stop()
  }
}
