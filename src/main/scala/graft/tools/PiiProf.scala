package graft.tools

import graft.queries.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off phase attribution for q117's scale slope: times the page
  * construction, each regex count, and each regex replace separately
  * over the ScaleSlope-scaled corpus, so a superlinear slope can be
  * pinned to a stage instead of guessed at. Temporary measurement
  * harness — results land in BASELINE.md.
  *
  * Run: SCALE_FACTOR=30 sbt 'runMain graft.tools.PiiProf'
  */
object PiiProf {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SCALE_FACTOR", "30").toInt
    val out = s"/tmp/graft_piiprof$factor"
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!new java.io.File(s"$out/documents.parquet").exists())
      ScaleSlope.buildCorpus(spark, base, out, factor)

    val docs = spark.read.parquet(s"$out/documents.parquet")
    def page: DataFrame = docs.select(col("doc_id"),
      TextAnalysis.piiPage(col("doc_id"), col("source"), col("text"))
        .as("page"))

    def time(name: String)(df: => DataFrame): Unit = {
      (0 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        System.err.println(
          f"[piiprof] $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
    }

    time("scan+md5(text)")(docs.select(md5(col("text"))))
    time("page+md5")(page.select(col("doc_id"), md5(col("page"))))
    time("count email")(page.select(col("doc_id"),
      size(regexp_extract_all(col("page"),
        lit(TextAnalysis.PiiEmailRe), lit(0)))))
    time("count ip")(page.select(col("doc_id"),
      size(regexp_extract_all(col("page"),
        lit(TextAnalysis.PiiIpRe), lit(0)))))
    time("count phone")(page.select(col("doc_id"),
      size(regexp_extract_all(col("page"),
        lit(TextAnalysis.PiiPhoneRe), lit(0)))))
    time("replace email")(page.select(col("doc_id"),
      md5(regexp_replace(col("page"), TextAnalysis.PiiEmailRe, "[EMAIL]"))))
    time("replace ip")(page.select(col("doc_id"),
      md5(regexp_replace(col("page"), TextAnalysis.PiiIpRe, "[IP]"))))
    time("replace phone")(page.select(col("doc_id"),
      md5(regexp_replace(col("page"), TextAnalysis.PiiPhoneRe, "[PHONE]"))))
    time("full q117")(TextAnalysis.piiRedact(page)
      .select(col("doc_id"), col("n_email"), col("n_ip"), col("n_phone"),
        md5(col("red")), length(col("red"))))
    spark.stop()
  }
}
