package graft

import org.apache.spark.sql.functions._
import graft.queries.{Selection, TextAnalysis}

/** q75 training-tensor materialization — the hash oracle cannot see BPE,
  * so the contract is pinned here: the emitted `token_ids` arrays must
  * equal a DRIVER-SIDE re-derivation (encode each doc, concat in doc_id
  * order within its shard, chunk by `SeqLen`), every sequence except the
  * last of each shard must be exactly full, and a re-run must be
  * byte-identical.
  */
class TrainTensorSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def collected() =
    SparkEntry.queries("q75_train_sequences")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3).split(",").map(_.toInt).toVector))

  private lazy val expected: Map[Long, Vector[Int]] = {
    import spark.implicits._
    val rank = TextAnalysis
      .bpeTrainOn(TextAnalysis.bpeVocab(spark, sf), TextAnalysis.BpeMerges)
      .zipWithIndex.map { case ((l, r, _), i) => (l, r) -> i }.toMap
    val ids = Selection.tokenIds(rank)
    val wordRe = "[a-z]+".r
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), Selection.seqShardOf(col("doc_id")).as("shard"),
        lower(col("text")).as("t"))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    docs.groupBy(_._2).map { case (shard, ds) =>
      shard -> ds.toVector.flatMap { case (_, _, t) =>
        wordRe.findAllIn(t).flatMap(w =>
          TextAnalysis.bpeEncode(w, rank).map(ids)).toVector
      }
    }
  }

  test("q75 sequences equal the re-derived per-shard id streams") {
    val rows = collected()
    val byShard = rows.groupBy(_._1)
    assert(byShard.keySet == expected.filter(_._2.nonEmpty).keySet)
    byShard.foreach { case (shard, seqs) =>
      val sorted = seqs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong),
        s"shard $shard seq_no not dense")
      val flat = sorted.toVector.flatMap(_._4)
      assert(flat == expected(shard), s"shard $shard id stream diverges")
      val chunks = expected(shard).grouped(Selection.SeqLen.toInt).toVector
      assert(sorted.map(_._4).toVector == chunks,
        s"shard $shard chunk boundaries diverge")
    }
  }

  test("q75 every sequence but the last of a shard is exactly full") {
    collected().groupBy(_._1).foreach { case (shard, seqs) =>
      val last = seqs.map(_._2).max
      seqs.foreach { case (_, no, n, idsRow) =>
        assert(n == idsRow.size)
        if (no < last)
          assert(n == Selection.SeqLen, s"shard $shard seq $no short: $n")
        else assert(n >= 1 && n <= Selection.SeqLen)
      }
    }
  }

  test("q75 re-run is byte-identical (deterministic shards)") {
    assert(collected().sortBy(r => (r._1, r._2)).toSeq ==
      collected().sortBy(r => (r._1, r._2)).toSeq)
  }

  test("q76 each epoch is a deterministic permutation, and epochs differ") {
    val rows = SparkEntry.queries("q76_epoch_shuffle")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == (0L until Selection.Epochs).toSet)
    val universes = byEpoch.toSeq.sortBy(_._1).map { case (e, rs) =>
      assert(rs.map(_._2).sorted.toSeq == rs.indices.map(_.toLong),
        s"epoch $e global steps not dense")
      rs.map(r => (r._3, r._4)).toSet
    }
    assert(universes.distinct.size == 1,
      "epochs cover different sequence universes")
    val orders = byEpoch.toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(r => (r._3, r._4)).toSeq)
    assert(orders.distinct.size == orders.size,
      "two epochs shipped the same order — the shuffle isn't shuffling")
  }
}
