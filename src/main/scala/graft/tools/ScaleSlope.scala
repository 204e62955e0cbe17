package graft.tools

import graft.{Harness, SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scale-slope validation (r06 verdict #3): the engine's 100 TB
  * claims rest on plan-SHAPE audits; this tool adds the measured check.
  * It synthesizes a FACTOR× corpus from sf0.1 by replication with
  * shifted ids, times the expensive catalog entries at 1× and FACTOR×,
  * and reports s(FACTOR×)/s(1×) per query — near-linear operators land
  * at ≲ FACTOR (plus constant overhead), a quadratic one explodes.
  *
  * Replication is ARTIFACT-AWARE, not naive:
  *   - documents: copy k > 0 rewrites every token with an `x<k>` suffix
  *     — verbatim copies would put each doc in a FACTOR-clique of exact
  *     dups, and every banded/bucketed candidate join would measure the
  *     replication artifact (bucket size × FACTOR ⇒ pairs × FACTOR²),
  *     not data scaling. Suffixed copies keep each copy's INTERNAL
  *     duplicate/quality structure while making copies disjoint in
  *     gram/shingle space — duplicate density per unit of corpus stays
  *     constant, the realistic scale-up.
  *   - embeddings: ids shift by copy; vectors keep their values. The
  *     model stays anchored (centroid seeds 100..107, queries < 50 are
  *     copy-0 ids) — fixed model, FACTOR× corpus, the production shape.
  *   - orders/lineitem: join keys shift consistently per copy, so the
  *     q93 graph becomes FACTOR disjoint components (block-diagonal
  *     scale-up; edges × FACTOR, iterations fixed).
  *
  * Run: SCALE_FACTOR=10 sbt 'runMain graft.tools.ScaleSlope'
  *      [SPARK_GRAFT_ONLY=q73,q82 to restrict]
  * Writes SCALE_SLOPE.json; slope table to stderr.
  */
object ScaleSlope {

  // id shift per copy — ONE spelling with the constructed-id guards'
  // block convention (Dedup.IdBlock): replica ids stay in each block's
  // low region, so snipOf/quoteOf accept replicated corpora and their
  // constructed ids remain provably alias-free
  private val Off = graft.queries.Dedup.IdBlock

  // the r06 top-expensive set + the verdict's watch list (q82 suffix
  // shuffle, q93 iteration rounds, q73 probe loop) + the round-7
  // composed q98; q60 is excluded — its scale law (flat per-batch cost
  // at 3x chain length) is proven by its own harness, and it reads no
  // corpus table
  private val Defaults = Seq(
    "q39_dup_clusters", "q55_dedup_survivors", "q59_kmeans_train",
    "q66_bpe_train", "q67_pipeline_manifest", "q73_quality_classifier",
    "q75_train_sequences", "q82_exactsubstr_any", "q83_cut_any_spans",
    "q86_classifier_certificate", "q88_ann_ivf_trained", "q93_pagerank",
    "q98_pipeline_suffix",
    // r09: the frozen-index MERGE lifecycle entries — the daily-promote
    // operation must hold its shape at corpus scale, not just pass the
    // merged≡rebuilt gate
    "q100_lex_index_merge", "q101_sem_index_merge",
    // r10: the RETRACTION inverses ride the same bar
    "q102_lex_index_retract", "q103_sem_index_retract",
    // r10: the decontamination CUT (corpus-linear gram scan + rewrite),
    // retrieval chunking, the eval-side leak report, and the
    // cluster-consistent split (rides q55's CC plan)
    "q104_decont_cut", "q105_chunk_windows", "q106_eval_leak_report",
    "q107_leak_safe_split", "q108_chunk_retrieval",
    // r11 (verdict #4): the fixed-length gram span/cut pair joins the
    // watch set — the any-length twins (q82/q83) were measured from the
    // start, but these have their own df-capped join shape to hold
    "q64_exact_substr_spans", "q72_cut_dup_spans",
    // r10: the release-diff operator (digest-narrow full-outer join)
    // and the curriculum manifest (q65's plan + a bounded boundary probe)
    "q109_corpus_diff", "q110_curriculum_phases",
    // r11: the release-gate split-stability report (two q107 plans
    // joined on the id spine — must inherit q107's CC scale posture ×2)
    "q111_split_stability",
    // r12: the manifest-read production form (ONE q107 plan + a narrow
    // stored-manifest scan — should track ~half of q111)
    "q124_split_stability_manifest",
    // r12: the C4 rule battery (scan-stage contains()/endswith — the
    // q117 cost class) and containment/engulfment detection (digest
    // gram table + rarest-probe inverted join — a new join shape to
    // hold at scale)
    "q126_c4_filters", "q127_containment",
    // r12: the containment-index lifecycle (append algebra, df collapse
    // at probe time) — promote must stay delta-only at corpus scale
    "q128_contain_index_merge", "q129_contain_index_retract",
    // r13: line-grain containment (census strip → line-digest index →
    // rarest-probe kernel — the composed strip+probe shape must hold)
    "q130_line_containment",
    // r14: the line-grain lifecycle (append/prune algebra at line
    // grain) and the chrome re-freeze pair (flip-set postings moves
    // over stored state — promote AND re-freeze must stay delta-/flip-
    // bounded at corpus scale)
    "q131_line_contain_merge", "q132_line_contain_retract",
    "q133_chrome_refreeze_add", "q134_chrome_refreeze_drop",
    // r11: the rebalance sampler (q48-class scan filter — should be
    // near-flat) and the quality-keeper (q55's CC plan + one agg)
    "q112_balanced_sample", "q113_quality_keeper",
    // r11: the per-source boilerplate strip (corpus-linear census on
    // (source, line-md5) + broadcast rewrite — the q104 gram-scan class)
    // and its lifecycle twins (delta census + SUM collapse); the census
    // companion doubles as q114's PHASE PROBE — its slope isolates the
    // census exchange from the scan-stage rewrite
    "q114_boilerplate_strip", "q123_boiler_census",
    "q115_boiler_index_merge", "q116_boiler_index_retract",
    // r11 (session 3): the PII scrub (pure scan-stage — should be
    // near-flat), keep-first paragraph dedup (digest census + the one
    // corpus reassembly partition — the q114 cost class plus a text
    // exchange), hard-negative mining (broadcast nested loop over the
    // eval flags — corpus-linear), and tokenizer fertility (q71's
    // vocab-encode class)
    "q117_pii_redact", "q118_paragraph_dedup", "q119_hard_negatives",
    "q120_tokenizer_fertility",
    // r11 (session 3): the truncation eval (q35's broadcast eval class
    // - NQ queries x candidate scan, two dots per pair)
    "q121_matryoshka_eval",
    // r11 (session 3): the composed cleaning pipeline (q114 census +
    // q118 digest election + q117 scan-stage scrub in one plan)
    "q122_clean_pipeline")

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SCALE_FACTOR", "10").toInt
    // floor of 2: with a single rep the ModelCache makes the 1x side
    // cache-hot (the warmup pre-trains) while the FACTORx first rep
    // pays full training — min() over >= 2 reps sees the cache-warm
    // execution on BOTH dirs, so the slope measures data scaling
    val reps = math.max(2, sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt)
    val out = s"/tmp/graft_scale$factor"
    // Harness.tuned (r15, verdict #1): the slope tool now measures the
    // SAME session conf Bench/Verify/Explain plan under (the r14 SHJ
    // baseline) — at-scale rows must validate the shipped posture, not
    // a conf the bench no longer runs. Pre-r15 ledger rows were
    // measured WITHOUT it; new rows land in a new ledger section, and
    // SPARK_GRAFT_SHJ=off reproduces the historical conf on any tool.
    val spark = Harness.tuned(SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    buildCorpus(spark, base, out, factor)

    val names = Harness.onlyFilter(Defaults)

    // per-query failure RECORDS a -1 data point instead of aborting:
    // the tool exists to catch a blow-up at scale, and a blow-up must
    // not destroy the 11 slopes already measured (r07 review; Bench's
    // own try/catch discipline)
    def time(name: String, dir: String): Double =
      try {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Harness.settle(spark)
        dt
      } catch {
        case e: Throwable =>
          System.err.println(s"[slope] $name FAILED: ${e.getMessage}")
          Harness.settle(spark)
          -1.0
      }
    // calib-BRACKETED (r09 verdict #2/#3): a slope ledger is only
    // comparable across sessions if each query's bracket shows what the
    // host was doing while IT ran — one probe before every query's
    // reps, one after the last (the bench-timeline discipline applied
    // to the slope tool)
    val calibStart = Harness.calibrate(spark)._1
    System.err.println(f"[slope] calib start $calibStart%.3fs")
    val rows = names.map { name =>
      System.err.println(s"[slope] $name ...")
      val cb = Harness.calibOnce(spark)
      Harness.settle(spark)
      time(name, base) // warmup: codegen + JIT for the plan shape
      val t1 = (1 to reps).map(_ => time(name, base)).min
      val tN = (1 to reps).map(_ => time(name, out)).min
      val slope = if (t1 > 0 && tN > 0) tN / t1 else -1.0
      System.err.println(
        f"[slope] $name%-28s 1x=$t1%6.2fs ${factor}x=$tN%7.2fs slope=$slope%5.2f calib=$cb%.2f")
      (name, t1, tN, slope, cb)
    }
    val calibEnd = Harness.calibOnce(spark)
    System.err.println(f"[slope] calib end $calibEnd%.3fs")
    val json = rows.map { case (n, t1, tN, sl, cb) =>
      f""""$n":{"t1":$t1%.3f,"t$factor":$tN%.3f,"slope":$sl%.3f,"calib":$cb%.3f}"""
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SCALE_SLOPE.json"),
      s"""{"base":"$base","factor":$factor,"reps":$reps,"calib_start":${
        f"$calibStart%.3f"},"calib_end":${f"$calibEnd%.3f"},"queries":$json}""")
    // the replicated corpus is factor x sf0.1 on disk — leaving it
    // behind accumulates gigabytes per factor across rounds (r07
    // review); a repeat run rebuilds it in ~a minute
    graft.queries.Scratch.deleteTree(out)
    spark.stop()
    rows.foreach { case (n, t1, tN, sl, cb) =>
      println(f"$n%-28s 1x=$t1%6.2fs ${factor}x=$tN%7.2fs slope=$sl%5.2f calib=$cb%.2f")
    }
  }

  /** Write the FACTOR× replicated corpus (idempotent overwrite). */
  private[tools] def buildCorpus(spark: SparkSession, base: String, out: String,
      factor: Int): Unit = {
    val copies = spark.range(factor).select(col("id").as("k"))
    def load(t: String): DataFrame = spark.read.parquet(s"$base/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    write(load("documents").crossJoin(broadcast(copies)).select(
      (col("doc_id") + col("k") * Off).as("doc_id"),
      when(col("k") === 0, col("text")).otherwise(
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1x"), col("k")))).as("text"),
      col("lang"), col("source"), col("n_chars")), "documents")

    write(load("embeddings").crossJoin(broadcast(copies)).select(
      (col("vec_id") + col("k") * Off).as("vec_id"),
      col("embedding"), col("label")), "embeddings")

    write(load("orders").crossJoin(broadcast(copies)).select(
      (col("o_orderkey") + col("k") * Off).as("o_orderkey"),
      (col("o_custkey") + col("k") * Off).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders")

    write(load("lineitem").crossJoin(broadcast(copies)).select(
      (col("l_orderkey") + col("k") * Off).as("l_orderkey"),
      col("l_partkey"),
      (col("l_suppkey") + col("k") * Off).as("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")), "lineitem")

    // dims pass through unchanged (fixed model side); events goes
    // through Tables.events — a raw read would crash on a
    // TIMESTAMP(NANOS) round, the exact footer case that reader
    // normalizes (r07 review)
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => write(load(t), t))
    write(Tables.events(spark, base), "events")
  }
}
