package graft

import org.apache.spark.sql.functions._

/** The WRITE path of a curated corpus — what actually lands on disk for
  * the training reader at 100 TB: the kept documents (q79's verdicts)
  * written hive-partitioned by language, so a per-language training
  * mixture reads ONLY its partitions (pruning proven on the read-back
  * plan, not assumed from the directory names).
  */
class CorpusLayoutSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("curated corpus writes lang-partitioned; read-back prunes partitions and round-trips") {
    val sp = spark
    import sp.implicits._
    val verdicts = SparkEntry.queries("q79_curation_audit")(sp, sf)
      .filter(col("keep")).select(col("doc_id"))
    val kept = Tables.documents(sp, sf)
      .join(verdicts, "doc_id")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val out = tmpDir("curated-corpus")
    kept.write.mode("overwrite").partitionBy("lang").parquet(out)

    // layout: one directory per language, hive-style
    val langs = kept.select("lang").distinct().as[String].collect().toSet
    val dirs = new java.io.File(out).listFiles
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == langs.map(l => s"lang=$l"), s"$dirs vs $langs")

    // read-back with a language filter must prune AT THE SCAN: the plan
    // carries a PartitionFilters entry on lang and reads no other dirs
    val back = sp.read.parquet(out).filter(col("lang") === "en")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("lang"), s"no partition pruning:\n$plan")
    assert(!plan.contains("PartitionFilters: []"), plan)

    // fidelity: the partitioned round-trip loses nothing
    val a = kept.orderBy("doc_id").collect().toSeq
    val b = sp.read.parquet(out)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "partitioned round-trip must be lossless")
    assert(back.count() ==
      kept.filter(col("lang") === "en").count())
  }
}
