package graft

import org.apache.spark.sql.functions._

/** q93's integer fixed-point PageRank kernel on constructed graphs:
  * the properties that make a centrality measure a centrality measure,
  * independent of the catalog tables.
  */
class PageRankSpec extends SparkSpec {

  private def ranksOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val sp = spark
    import sp.implicits._
    graft.queries.Relational.pageRankInt(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
  }

  test("star graph: the hub out-ranks every leaf; leaves tie exactly") {
    val leaves = (1L to 8L)
    val r = ranksOf(leaves.map(l => (0L, l)))
    assert(leaves.forall(l => r(0L) > r(l)), r)
    assert(leaves.map(r).toSet.size == 1, s"leaves must tie: $r")
  }

  test("ring graph: perfect symmetry gives identical ranks") {
    val n = 6L
    val r = ranksOf((0L until n).map(i => (i, (i + 1) % n)))
    assert(r.values.toSet.size == 1, r)
  }

  test("mass is conserved up to integer-truncation loss, and determinism is exact") {
    val rnd = new scala.util.Random(5)
    val edges = (0 until 60)
      .map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(e => e._1 != e._2).distinct
    val r1 = ranksOf(edges)
    val total = r1.values.sum
    val n = r1.size
    // each of 10 rounds loses < 1 unit per edge-endpoint to `div`;
    // teleport injects exactly 0.15·SCALE·n per round
    assert(total <= 1000000L * n, s"mass grew: $total vs ${1000000L * n}")
    assert(total > (1000000L * n * 9) / 10, s"mass bled away: $total")
    assert(ranksOf(edges) == r1, "re-run must be bit-identical")
  }
}
