package graft

import graft.queries.TextAnalysis

/** q73 in-engine logistic regression: the rows-only entry's semantic
  * gates — training must actually LEARN (strictly decreasing loss,
  * accuracy above the majority baseline), and must be deterministic
  * run-to-run (a re-run ships the identical model).
  */
class ClassifierSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("training loss strictly decreases every round") {
    val docs = Tables.documents(spark, sf)
    val (_, losses) = TextAnalysis.clsTrain(
      TextAnalysis.clsFeatures(docs), TextAnalysis.clsLabels(docs))
    assert(losses.size >= 2)
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss went up: $losses")
    }
  }

  test("learned model beats the majority-class baseline on its training set") {
    val sp = spark
    import sp.implicits._
    val out = SparkEntry.queries("q73_quality_classifier")(sp, sf)
      .select("label", "predicted").as[(Boolean, Boolean)].collect()
    val majority = math.max(out.count(_._1), out.count(!_._1)).toDouble / out.length
    val acc = out.count(r => r._1 == r._2).toDouble / out.length
    assert(majority < 1.0, "labels degenerate — spec is vacuous")
    assert(acc > majority,
      f"accuracy $acc%.3f did not beat majority baseline $majority%.3f")
  }

  test("training is deterministic run-to-run") {
    val docs = Tables.documents(spark, sf)
    val (w1, l1) = TextAnalysis.clsTrain(
      TextAnalysis.clsFeatures(docs), TextAnalysis.clsLabels(docs))
    val (w2, l2) = TextAnalysis.clsTrain(
      TextAnalysis.clsFeatures(docs), TextAnalysis.clsLabels(docs))
    assert(w1.toSeq == w2.toSeq)
    assert(l1 == l2)
  }
}
