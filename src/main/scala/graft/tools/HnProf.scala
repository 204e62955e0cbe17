package graft.tools

import graft.{Harness, Tables}
import graft.queries.{Dedup, Scratch, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only q119 stage attribution: times the hard-negative miner's
  * independent legs (word-stats materialize, leak-pair relation, the
  * scorer tail) separately so the dominant leg is a measured number,
  * not a guess. Mirrors hardNegatives' subplans; the entry itself stays
  * the one spelling in TextAnalysis.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.tools.HnProf'
  */
object HnProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = Harness.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    val terms = TextAnalysis.HnTerms

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(
        f"[hnprof] $tag ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }

    (0 to reps).foreach { rep =>
      System.err.println(s"[hnprof] --- rep $rep ---")
      val docs = Tables.documents(spark, sfDir)
      val ev = docs.filter(col("doc_id") % 10 === 3)
      val tr = docs.filter(col("doc_id") % 10 =!= 3)
      timed("evCount") { ev.count(); () }
      var wstats: DataFrame = null
      timed("wstats-materialize") {
        wstats = Scratch.materialize(
          tr.select(col("doc_id"),
              explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"),
                lit(0))).as("w"))
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as("dl"),
              terms.map(t =>
                sum(when(col("w") === t, lit(1L)).otherwise(lit(0L)))
                  .as(s"tf_$t")): _*),
          "hnprof_ws")
      }
      val globAggs = sum(col("dl")).as("tot_tokens") +:
        terms.map(t =>
          sum(when(col(s"tf_$t") > 0, lit(1L)).otherwise(lit(0L)))
            .as(s"df_$t"))
      val glob = broadcast(wstats.agg(
        count(lit(1)).as("n_docs"), globAggs: _*))
      val perDoc = wstats
        .where(terms.map(t => col(s"tf_$t") > 0).reduce(_ || _))
        .crossJoin(glob)
        .select(col("doc_id") +: terms.map(t =>
          when(col(s"tf_$t") > 0,
            (col("n_docs") - col(s"df_$t")) * col(s"tf_$t") * lit(2.2) /
              (col(s"tf_$t") + lit(0.3) + lit(0.9) *
                ((col("dl") * col("n_docs")).cast("double") /
                  col("tot_tokens").cast("double")))).as(s"s_$t")): _*)
      val evFlags = ev.select(col("doc_id").as("eval_id"),
          explode(array_distinct(regexp_extract_all(lower(col("text")),
            lit("[a-z]+"), lit(0)))).as("w"))
        .filter(col("w").isin(terms: _*))
        .groupBy(col("eval_id")).pivot("w", terms).agg(min(lit(1)))
        .select(col("eval_id") +: terms.map(t => col(t).as(s"q_$t")): _*)
      val evGrams = Dedup.ngramEntries(ev, Dedup.DecontN)
        .select(col("doc_id").as("eval_id"), col("s"))
      val leak = Dedup.ngramEntries(tr, Dedup.DecontN)
        .select(col("s"), col("doc_id"))
        .join(broadcast(evGrams), "s")
        .select(col("eval_id"), col("doc_id")).distinct()
      timed("leak-alone") { noop(leak) }
      timed("evFlags-alone") { noop(evFlags) }
      val score = round(terms.map(t =>
        when(col(s"q_$t").isNotNull, coalesce(col(s"s_$t"), lit(0.0)))
          .otherwise(lit(0.0))).reduce(_ + _), 4)
      val win = Window.partitionBy(col("eval_id"))
        .orderBy(col("score").desc, col("doc_id"))
      val pairsScored = perDoc.crossJoin(broadcast(evFlags))
        .select(col("eval_id"), col("doc_id"), score.as("score"))
        .where(col("score") > 0)
      timed("pairs-scored-alone") { noop(pairsScored) }
      // attribution experiments: is the BNLJ join-condition placement
      // (score>0 pushed INTO the join) the cost, or the pair volume?
      val pairsNoFilter = perDoc.crossJoin(broadcast(evFlags))
        .select(col("eval_id"), col("doc_id"), score.as("score"))
      timed("pairs-unfiltered") { noop(pairsNoFilter) }
      val pairsIds = perDoc.crossJoin(broadcast(
          evFlags.select(col("eval_id"))))
        .select(col("eval_id"), col("doc_id"))
      timed("pairs-ids-only") { noop(pairsIds) }
      timed("npatterns") {
        val np = evFlags.select(terms.map(t => col(s"q_$t")): _*)
          .distinct().count()
        System.err.println(s"[hnprof] distinct flag patterns = $np")
      }
      timed("leak-per-eval") {
        val mx = leak.groupBy(col("eval_id")).count()
          .agg(max(col("count")), avg(col("count"))).collect()(0)
        System.err.println(
          s"[hnprof] leak pairs per eval max=${mx.get(0)} avg=${mx.get(1)}")
      }
      val full = pairsScored
        .join(broadcast(leak), Seq("eval_id", "doc_id"), "left_anti")
        .withColumn("hn_rank", row_number().over(win).cast("int"))
        .where(col("hn_rank") <= TextAnalysis.HnK)
        .select(col("eval_id"), col("hn_rank"), col("doc_id"),
          col("score"))
        .orderBy(col("eval_id"), col("hn_rank"))
      timed("tail-from-materialized-wstats") { noop(full) }
      Harness.settle(spark)
    }
    spark.stop()
  }
}
