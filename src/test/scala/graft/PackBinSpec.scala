package graft

import org.apache.spark.sql.functions._
import graft.queries.{Dedup, Selection}

/** q77 boundary-respecting best-fit packing — a stateful greedy has no
  * SQL oracle, so the contract is pinned here: every document placed
  * exactly once, bins never overflow the budget, offsets within a bin
  * tile it contiguously, documents are never split (only flagged-
  * truncated when longer than the budget), re-runs are byte-identical,
  * the bounded-open-bin eviction path actually works, and the packing
  * is EFFICIENT — bin count within 25% of the concat-then-chunk lower
  * bound on the real corpus.
  */
class PackBinSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val budget = Dedup.PackBudget

  private def packed() =
    SparkEntry.queries("q77_bestfit_pack")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))

  test("q77 places every document exactly once, never overflowing a bin") {
    val rows = packed()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_._3).distinct.length == rows.length)
    assert(rows.length == nDocs)
    rows.groupBy(r => (r._1, r._2)).foreach { case ((sh, bin), rs) =>
      assert(rs.map(_._5).sum <= budget, s"bin ($sh,$bin) overflows")
      val sorted = rs.sortBy(_._4)
      assert(sorted.head._4 == 0L, s"bin ($sh,$bin) does not start at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4 == a._4 + a._5, s"bin ($sh,$bin) offsets not contiguous")
        case _ =>
      }
    }
  }

  test("q77 never splits a document; truncation flag is exact") {
    val rows = packed()
    assert(rows.forall(r => r._5 <= budget))
    assert(rows.forall(r => r._4 + r._5 <= budget))
    // flag ⟺ the original token count exceeded the budget
    val flagged = rows.filter(_._6).map(_._3).toSet
    import spark.implicits._
    val oversize = Dedup.packToks(Tables.documents(spark, sf))
      .filter(col("n_tok") > budget).select("doc_id")
      .as[Long].collect().toSet
    assert(flagged == oversize)
  }

  test("q77 is deterministic") {
    assert(packed().toSeq == packed().toSeq)
  }

  test("q77 bin count is within 25% of the concat-then-chunk lower bound") {
    val rows = packed()
    val bins = rows.map(r => (r._1, r._2)).distinct.length
    val lb = rows.groupBy(_._1).values
      .map(rs => (rs.map(_._5).sum + budget - 1) / budget).sum
    assert(bins <= (lb * 1.25).ceil.toLong + rows.map(_._1).distinct.length,
      s"$bins bins vs lower bound $lb — packing is too loose")
  }

  test("q77 kernel: bounded open bins evict without overflow or dense-id gaps") {
    import spark.implicits._
    // 200 budget-sized docs in one shard: every doc needs its own bin,
    // so the 64-bin open set must evict ~136 times
    val toks = (0L until 200L).map(id => (id, budget, 0L))
      .toDF("doc_id", "n_tok", "shard")
    val rows = Selection.bestFitPack(toks).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 200)
    assert(rows.map(_._1).sorted.toSeq == (0L until 200L),
      "bin ids not dense after eviction")
    assert(rows.forall(_._3 == 0L))
  }

  test("q77 kernel: zero-token documents share a slot but stay totally ordered") {
    import spark.implicits._
    // three empty docs + one real one on a single shard: empties place
    // at the same (bin, off) without advancing it; the output must
    // still carry all four, deterministically (doc_id tie-break)
    val toks = Seq((5L, 0L, 0L), (3L, 0L, 0L), (9L, 100L, 0L),
      (7L, 0L, 0L)).toDF("doc_id", "n_tok", "shard")
    val a = Selection.bestFitPack(toks).collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getLong(3), r.getLong(4)))
    val b = Selection.bestFitPack(toks).collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(a.toSeq == b.toSeq, "zero-token ties broke determinism")
    assert(a.map(_._1).sorted.toSeq == Seq(3L, 5L, 7L, 9L))
    assert(a.forall { case (_, _, off, n) => off + n <= Dedup.PackBudget })
  }

  test("q77 kernel fuzz: invariants hold on 20 seeded random worlds") {
    // the machine itself, off-Spark: random budgets and doc sizes must
    // never overflow a bin, always tile offsets contiguously, keep the
    // open set bounded, and number bins densely — the ReorgFuzzSpec
    // discipline applied to the packer
    for (seed <- 0 until 20) {
      val rnd = new scala.util.Random(seed)
      val b = 64L + rnd.nextInt(2000)
      val bins = Selection.BestFitBins.empty
      val placed = (0 until 500).map { i =>
        val n = 1L + rnd.nextInt(b.toInt)
        val (bin, off) = bins.place(n, b)
        (i.toLong, bin, off, n)
      }
      placed.groupBy(_._2).values.foreach { rs =>
        val sorted = rs.sortBy(_._3)
        assert(sorted.head._3 == 0L, s"seed $seed: bin not started at 0")
        sorted.sliding(2).foreach {
          case Seq(x, y) =>
            assert(y._3 == x._3 + x._4, s"seed $seed: offsets not contiguous")
          case _ =>
        }
        assert(sorted.last._3 + sorted.last._4 <= b,
          s"seed $seed: bin overflows")
      }
      assert(bins.open.length <= Selection.OpenBins)
      assert(placed.map(_._2).distinct.sorted == (0L until bins.nextBin),
        s"seed $seed: bin ids not dense")
    }
  }

  test("q77 kernel: complementary sizes pack perfectly; shards reset bin ids") {
    import spark.implicits._
    val half = budget / 2
    // shard 0: 10 docs of exactly half a budget → 5 perfectly full bins;
    // shard 1: 4 more — its bin ids must restart at 0
    val toks = ((0L until 10L).map(id => (id, half, 0L)) ++
      (100L until 104L).map(id => (id, half, 1L)))
      .toDF("doc_id", "n_tok", "shard")
    val rows = Selection.bestFitPack(toks).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val s0 = rows.filter(_._1 == 0L)
    assert(s0.map(_._2).distinct.sorted.toSeq == (0L until 5L))
    s0.groupBy(_._2).values.foreach(b => assert(b.length == 2))
    val s1 = rows.filter(_._1 == 1L)
    assert(s1.map(_._2).distinct.sorted.toSeq == (0L until 2L),
      "shard 1 bin ids did not reset")
  }
}
