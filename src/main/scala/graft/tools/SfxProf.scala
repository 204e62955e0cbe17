package graft.tools

import graft.Harness
import graft.queries.{Scratch, SuffixDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase attribution for the suffix pipeline (the q82/q83/q98 kernel) —
  * the QueryProf discipline applied to the engine's widest exchange:
  * after the r09 single-doc-gram prune, the wide suffix path carries
  * ~10% of positions, so the question "what now dominates at 30×?"
  * needs measured phase times, not plan reading.
  *
  * Phases (cumulative pipeline prefixes, each an independent action):
  *   sfx   — suffixEntries materialized: tokenize + dictionary encode
  *           (+ the inline `[timing] sfx tidsByDoc` print when
  *           graft.engine.timing is on) + gram census + pruned wide
  *           emit + scratch write;
  *   lcp   — the two repartition-sorts + directional scans + the
  *           per-position max-agg over the materialized sfx table;
  *   q82   — the full spansOf (adds the span-union window + sort).
  *
  * The FACTOR× corpus is ScaleSlope's documents replication (token-
  * suffixed copies — cross-doc gram density preserved, copies disjoint
  * in gram space); only `documents` is built, the pipeline reads no
  * other table.
  *
  * Run: SCALE_FACTOR=30 sbt 'runMain graft.tools.SfxProf'
  */
object SfxProf {

  private val Off = 10000000L // id shift per copy (ScaleSlope's)

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SCALE_FACTOR", "30").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val out = s"/tmp/graft_sfxprof$factor"
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("graft.engine.timing", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val copies = spark.range(factor).select(col("id").as("k"))
    spark.read.parquet(s"$base/documents.parquet")
      .crossJoin(broadcast(copies)).select(
        (col("doc_id") + col("k") * Off).as("doc_id"),
        when(col("k") === 0, col("text")).otherwise(
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1x"), col("k")))).as("text"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val docs = spark.read.parquet(s"$out/documents.parquet")

    def time(name: String)(action: => Unit): Double = {
      action // warmup
      Harness.settle(spark)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        action
        val dt = (System.nanoTime() - t0) / 1e9
        Harness.settle(spark)
        dt
      }
      val best = ts.min
      System.err.println(f"[sfxprof] $name%-6s min=$best%7.2fs of " +
        ts.map(t => f"$t%.2f").mkString("[", ",", "]"))
      best
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val tSfx = time("sfx") {
      noop(Scratch.materialize(SuffixDedup.suffixEntries(docs), "prof_sfx"))
    }
    val tLcp = time("lcp") {
      val sfx = Scratch.materialize(SuffixDedup.suffixEntries(docs), "prof_sfx")
      noop(SuffixDedup.positionLcpFrom(sfx))
    }
    val tQ82 = time("q82") { noop(SuffixDedup.spansOf(docs)) }
    System.err.println(
      f"[sfxprof] attribution at ${factor}x: sfx=$tSfx%.2fs " +
        f"lcp-over-sfx=${tLcp - tSfx}%.2fs rest=${tQ82 - tLcp}%.2fs " +
        f"total=$tQ82%.2fs")
    Scratch.deleteTree(out)
    spark.stop()
  }
}
