package graft

import org.apache.spark.sql.functions._
import graft.queries.Selection

/** q74's value-hash oracle pins the arithmetic, not the point: DSIR
  * selection must actually ENRICH documents that look like the target
  * distribution (the q36 lesson — an index can be hash-green and
  * useless). Constructed corpus: the target shard (doc_id % 10 == 7)
  * writes in "science" vocabulary; raw documents are half science-like,
  * half spam. Selection must overwhelmingly pick the science-like half,
  * and a re-run must pick the identical set.
  */
class SelectionQualitySpec extends SparkSpec {

  private val science = Seq("quantum", "theory", "energy", "neutron",
    "momentum", "operator", "spectrum", "lattice", "tensor", "field")
  private val spam = Seq("winner", "click", "free", "casino", "bonus",
    "prize", "deal", "offer", "cash", "jackpot")

  /** Deterministic pseudo-text: 30 words drawn round-robin with a
    * doc-dependent stride so documents differ but stay in-vocabulary.
    */
  private def textOf(vocab: Seq[String], seed: Long): String =
    (0 until 30).map(i => vocab(((seed + 1) * (i + 3) % vocab.size).toInt))
      .mkString(" ")

  private def corpus() = {
    import spark.implicits._
    // target shard: ids ending in 7 (science); raw: ids 0..199 skipping
    // the shard — even ids science-like, odd ids spam
    val target = (0 until 10).map(i => (i * 10L + 7, textOf(science, i)))
    val raw = (0L until 200L).filter(_ % 10 != 7).map(id =>
      (id, textOf(if (id % 2 == 0) science else spam, id)))
    (target ++ raw).toDF("doc_id", "text")
  }

  test("q74 selection enriches target-like documents") {
    val picked = Selection.dsirSelect(corpus(), 40)
      .select("doc_id").collect().map(_.getLong(0))
    assert(picked.length == 40)
    assert(picked.forall(_ % 10 != 7), "selected from the target shard")
    val scienceLike = picked.count(_ % 2 == 0)
    assert(scienceLike >= 38,
      s"only $scienceLike/40 selected docs are target-like")
  }

  test("q74 selection is deterministic") {
    val a = Selection.dsirSelect(corpus(), 40).collect().toSeq
    val b = Selection.dsirSelect(corpus(), 40).collect().toSeq
    assert(a == b)
  }

  test("q78 checksums are partitioning-independent (the point of XOR)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = Selection.contentChecksums(docs).collect().toSeq
    val scrambled = Selection.contentChecksums(
      docs.repartition(7, col("doc_id"))).collect().toSeq
    assert(base == scrambled,
      "checksum changed under a different partitioning")
    assert(base.nonEmpty)
  }

  test("q112: √-temperature rebalance keeps the smallest stratum whole and kept counts track √n") {
    val sp = spark
    import sp.implicits._
    val sf = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q112_balanced_sample")(sp, sf)
      .select(col("lang"), col("n_lang")).as[(String, Long)].collect()
    val keptBy = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nBy = rows.groupBy(_._1).view.mapValues(_.head._2).toMap
    val nMin = nBy.values.min
    // smallest stratum: rate 1 ⇒ kept WHOLE, exactly
    val smallest = nBy.minBy(_._2)._1
    assert(keptBy(smallest) == nBy(smallest),
      s"smallest stratum not kept whole: $keptBy of $nBy")
    // every stratum's kept count is a binomial draw around √(n_min·n):
    // pin within ±4σ so the policy (not just the hash) is what's tested
    nBy.foreach { case (lang, n) =>
      val expect = math.sqrt(nMin.toDouble * n)
      val sigma = math.sqrt(n * (expect / n) * (1 - expect / n)) max 1.0
      assert(math.abs(keptBy(lang) - expect) <= 4 * sigma,
        s"$lang kept ${keptBy(lang)}, expected ~$expect (n=$n)")
    }
    // the head stratum actually shrinks (the policy engages: the
    // fixture's en count is ~3x the tail)
    val head = nBy.maxBy(_._2)._1
    assert(keptBy(head) < nBy(head),
      s"head stratum $head not downsampled: $keptBy of $nBy")
    // determinism: membership is a pure function of (doc_id, counts)
    val again = SparkEntry.queries("q112_balanced_sample")(sp, sf)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    val first = SparkEntry.queries("q112_balanced_sample")(sp, sf)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(again == first, "re-run changed sample membership")
  }

  test("q74 scores order spam strictly below target-like documents") {
    val scored = Selection.dsirSelect(corpus(), 180)
      .select(col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sci = scored.filter(_._1 % 2 == 0).map(_._2)
    val spm = scored.filter(_._1 % 2 == 1).map(_._2)
    assert(sci.nonEmpty && spm.nonEmpty)
    assert(sci.min > spm.max,
      s"score ranges overlap: science [${sci.min},${sci.max}] vs " +
        s"spam [${spm.min},${spm.max}]")
  }
}
