package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions.col

/** The q39 clustering core must be correct on graphs far deeper than its
  * round cap: pointer jumping makes convergence O(log diameter), and cap
  * exhaustion fails loudly instead of emitting wrong labels (the round-3
  * defect: a silent `iter < 20` stop on diameter > 20 graphs).
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val sp = spark
    import sp.implicits._
    Dedup.connectedComponents(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph with diameter 127 (>> 20 rounds plain) converges to one component") {
    val path = (0L until 127L).map(i => (i, i + 1))
    val labels = cc(path)
    assert(labels.size == 128)
    assert(labels.values.toSet == Set(0L), "every node must label to the min id")
  }

  test("disjoint components keep distinct min labels; isolated edge pairs work") {
    val edges = Seq((10L, 11L), (11L, 12L), // component min 10
      (50L, 51L), // pair
      (7L, 99L), (99L, 8L)) // min 7
    val labels = cc(edges)
    assert(labels == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      50L -> 50L, 51L -> 50L, 7L -> 7L, 99L -> 7L, 8L -> 7L))
  }

  test("ring (cycle) converges — no pathological oscillation") {
    val n = 64L
    val ring = (0L until n).map(i => (i, (i + 1) % n))
    val labels = cc(ring)
    assert(labels.size == n)
    assert(labels.values.toSet == Set(0L))
  }

  test("cap exhaustion fails loudly instead of silently mislabeling") {
    val sp = spark
    import sp.implicits._
    // 2^2 = 4 reach with maxRounds=2 cannot cover a 40-hop chain
    val path = (0L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(path, maxRounds = 2).collect()
    }
  }

  test("q39 oracle shape unchanged: labels are component minima of the candidate graph") {
    val sp = spark
    import sp.implicits._
    // star + chain mixed: {1..5} via hub 1, {20,21}
    val edges = Seq((1L, 2L), (1L, 3L), (3L, 4L), (4L, 5L), (20L, 21L))
    val labels = cc(edges)
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      20L -> 20L, 21L -> 20L))
    // cluster sizes as q39 reports them
    val sizes = Dedup.connectedComponents(edges.toDF("a", "b"))
      .groupBy("cluster_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(1L -> 5L, 20L -> 2L))
  }
}
