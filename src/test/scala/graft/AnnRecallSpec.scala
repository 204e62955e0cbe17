package graft

/** ANN quality gate: recall@5 of the approximate indexes (q36 sign-LSH,
  * q37 IVF) against the exact brute-force ranking (q35). An ANN operator
  * whose recall is never measured is unverified by construction — the
  * hash gate only pins that each index returns ITS OWN definitionally
  * correct neighbors, not that those neighbors are any good.
  */
class AnnRecallSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** query_id -> top-5 candidate ids of an ANN result (all the ANN
    * queries emit (query_id, cand_id, ..., rank) rows).
    */
  private def top5Of(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Set[Long]] = {
    val rankIdx = df.columns.indexOf("rank")
    df.collect()
      .filter(_.getInt(rankIdx) <= 5)
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
  }

  private def top5(name: String): Map[Long, Set[Long]] =
    top5Of(SparkEntry.queries(name)(spark, sf))

  private def recallAt5(ann: Map[Long, Set[Long]],
      exact: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, truth) =>
      ann.getOrElse(q, Set.empty).count(truth.contains) / 5.0
    }
    per.sum / per.size
  }

  test("q36 sign-LSH and q37 IVF reach useful recall@5 vs the exact baseline") {
    val exact = top5("q35_topk_cosine")
    assert(exact.nonEmpty && exact.values.forall(_.size == 5))
    val lsh = recallAt5(top5("q36_ann_lsh"), exact)
    val ivf = recallAt5(top5("q37_ann_ivf"), exact)
    // the scale claim of an LSH index is recall AND probed fraction
    // together — either alone can be gamed (probe everything: recall 1)
    val frac = graft.queries.Similarity.probedFraction(spark, sf)
    info(f"recall@5: sign-LSH=$lsh%.2f (probing $frac%.2f of corpus) ivf=$ivf%.2f")
    // floors set from measured values minus slack (ivf 0.44; multiprobe
    // lsh measured 0.60 probing ~0.3 of the corpus — the pre-multiprobe
    // exact-bucket config measured 0.32 at ~0.25, and the original
    // single-table 8-bit LSH measured 0.00, which is what forced the
    // redesigns). A refactor that degrades either index (wrong plane
    // math, bad probe strings, bad list assignment) lands far below
    // these long before the hash gate notices.
    assert(ivf >= 0.35, f"IVF recall@5 collapsed: $ivf%.2f")
    assert(lsh >= 0.45, f"sign-LSH recall@5 collapsed: $lsh%.2f")
    assert(frac <= 0.5, f"LSH probes too much of the corpus: $frac%.2f")
  }

  test("q59-trained quantizer co-locates true neighbor pairs at least as well as seeds") {
    // 5-query recall@5 is a 25-sample metric — too noisy to grade a
    // quantizer (and raw recall rewards skewed lists: a huge probed
    // list is brute force wearing an index). The robust measure: of
    // the corpus's true high-cosine pairs (q34's near-dup ground
    // truth, cosine-ranked), what fraction lands in the SAME inverted
    // list? A one-list probe finds exactly the co-located ones.
    import org.apache.spark.sql.functions._
    val S = graft.queries.Similarity
    val truePairs = SparkEntry.queries("q34_embedding_neardup")(spark, sf)
      .select(col("vec_a"), col("vec_b"))
    val (e, seedCent) = S.kmeansInputs(spark, sf)
    val (_, trainedCent, _) = S.kmeans(spark, sf)
    def coLocation(cent: org.apache.spark.sql.DataFrame): Double = {
      val asg = S.kmeansAssignment(e, cent)
        .select(col("vec_id"), col("cid"))
      val n = truePairs.count().toDouble
      val co = truePairs
        .join(asg.select(col("vec_id").as("vec_a"), col("cid").as("ca")), "vec_a")
        .join(asg.select(col("vec_id").as("vec_b"), col("cid").as("cb")), "vec_b")
        .filter(col("ca") === col("cb")).count()
      co / n
    }
    val seeded = coLocation(seedCent)
    val trained = coLocation(trainedCent)
    info(f"true-pair co-location: trained=$trained%.2f seeded=$seeded%.2f")
    assert(trained >= seeded - 0.02,
      f"training made the quantizer WORSE at keeping true neighbors " +
        f"together: $trained%.2f < $seeded%.2f")
  }

  test("q88 trained-IVF beats the seeded quantizer at matched probed fraction") {
    // The catalog's 5-query recall is a 25-sample metric: measured
    // 0.20 (trained) vs 0.44 (seeded) — noise, as the 50-query rerun
    // shows. The robust gate: over 50 queries at the SAME nProbe=2
    // (probed fraction 0.257 trained vs 0.252 seeded — matched cost),
    // the q59-trained quantizer must beat the seeded one, proving the
    // training stage feeds retrieval. Measured: trained 0.51 vs
    // seeded 0.45; floors carry slack only below the seeded line.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val S = graft.queries.Similarity
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions
        .floatDot(col("embedding"), col("embedding"))))
    val q50 = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val cand = e.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    val exact50 = broadcast(q50)
      .join(cand, col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(graft.functions.VectorFunctions.floatDot(col("qe"), col("ce"))
          / (col("qn") * col("cn")), 4).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }
    def recall50(m: Map[Long, Set[Long]]): Double = {
      val per = exact50.map { case (q, t) =>
        m.getOrElse(q, Set.empty).count(t.contains) / 5.0 }
      per.sum / per.size
    }
    def seedCent(e: org.apache.spark.sql.DataFrame) =
      e.filter(col("vec_id") >= 100L && col("vec_id") < 108L)
        .select(col("vec_id").as("cid"), col("embedding").as("cent_emb"),
          col("nrm").as("cent_nrm"))
    val (_, trained, _) = S.kmeans(spark, sf)
    def trainedCent(e: org.apache.spark.sql.DataFrame) =
      trained.select(col("cid"), col("cent").as("cent_emb"),
        sqrt(graft.functions.VectorFunctions.floatDot(col("cent"), col("cent")))
          .as("cent_nrm"))
    val rs = recall50(top5Of(S.ivfQuery(spark, sf, seedCent, 2, 50)))
    val rt = recall50(top5Of(S.ivfQuery(spark, sf, trainedCent, 2, 50)))
    val fs = S.ivfProbedFraction(spark, sf, seedCent, nq = 50)
    val ft = S.ivfProbedFraction(spark, sf, trainedCent, nq = 50)
    info(f"50-query recall@5: trained=$rt%.2f (probing $ft%.3f) " +
      f"seeded=$rs%.2f (probing $fs%.3f)")
    assert(ft <= fs + 0.05, f"trained quantizer probes more: $ft%.3f vs $fs%.3f")
    assert(rt > rs, f"training did not improve retrieval: $rt%.2f <= $rs%.2f")
    assert(rt >= 0.45, f"trained-IVF recall collapsed: $rt%.2f")
  }

  test("q96 certificate: floor booleans hold and the exact leg covers every query") {
    // the driver pins the VALUES against DuckDB; this gate catches a
    // recall/probed-fraction regression (boolean flip) pre-driver, and
    // pins the shape: 5 exact rows for each of the NQc certificate
    // queries, ranks 1..5
    val rows = SparkEntry.queries("q96_ann_certificate")(spark, sf).collect()
    assert(rows.length == graft.queries.Similarity.NQc * 5,
      s"expected ${graft.queries.Similarity.NQc * 5} exact rows, got ${rows.length}")
    assert(rows.forall(r => r.getBoolean(r.fieldIndex("recall_floor_met"))),
      "trained-IVF recall@5 fell below the certificate floor")
    assert(rows.forall(r => r.getBoolean(r.fieldIndex("probed_capped"))),
      "trained-IVF probed fraction exceeded the certificate cap")
  }

  test("q57 PQ-ADC with exact rerank reaches useful recall@5") {
    val exact = top5("q35_topk_cosine")
    val pq = recallAt5(top5("q57_ann_pq"), exact)
    info(f"recall@5: pq-adc=$pq%.2f (ADC shortlist 64, 32x compression)")
    // floor from measured value minus slack: the ADC shortlist of 50
    // must surface most true neighbors for the exact rerank to keep —
    // a broken codebook/code assignment collapses this to ~0.1
    // (the hit rate of a random 50-of-500 shortlist) long before the
    // hash gate notices.
    assert(pq >= 0.55, f"PQ recall@5 collapsed: $pq%.2f")
  }
}
