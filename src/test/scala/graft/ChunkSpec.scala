package graft

import org.apache.spark.sql.functions._
import graft.queries.{Dedup, Selection}

/** Behavioral gates for q105 retrieval chunking — the invariants the
  * value-hash oracle cannot falsify directly: total token coverage,
  * the stride/width emission contract, exact reconstruction of every
  * chunk's text from its source, and the edge shapes (empty document,
  * one token, exactly one window, one past a window) the corpus
  * fixture cannot be trusted to contain.
  */
class ChunkSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val W = Selection.ChunkW
  private val S = Selection.ChunkS

  private def toks(text: String): Array[String] =
    if (text == null) Array.empty[String]
    else Dedup.WordRe.findAllIn(text).toArray

  /** Checks the full q105 contract for one document's chunk rows. */
  private def checkDoc(words: Array[String],
                       rows: Seq[(Long, Long, Long, String)]): Unit = {
    val n = words.length
    val sorted = rows.sortBy(_._1)
    // chunk ids are dense from 0 and starts follow the stride
    sorted.zipWithIndex.foreach { case ((k, st, nt, txt), i) =>
      assert(k == i, s"chunk ids not dense: $sorted")
      assert(st == k * S, s"start != k*stride at chunk $k")
      assert(nt == math.min(W, n - st).max(0), s"n_tok wrong at chunk $k")
      assert(txt == words.slice(st.toInt, (st + nt).toInt).mkString(" "),
        s"chunk $k text does not reconstruct from the source")
    }
    // emission rule: chunk k exists iff k == 0 or the previous chunk
    // did not reach the end — so the count is determined by n alone
    val expected = if (n <= W) 1 else 1 + ((n - W).toDouble / S).ceil.toInt
    assert(sorted.size == expected,
      s"n=$n: expected $expected chunks, got ${sorted.size}")
    // total coverage: the last chunk ends exactly at the document end
    val last = sorted.last
    assert(last._2 + last._3 == n.max(0), s"tail not covered: n=$n $last")
    // overlap: stride < width, so consecutive chunks share tokens and
    // no token index falls in a gap
    sorted.sliding(2).foreach {
      case Seq((_, st1, nt1, _), (_, st2, _, _)) =>
        assert(st2 <= st1 + nt1, s"gap between chunks at $st2")
      case _ =>
    }
  }

  test("q105: every corpus document is covered by stride-contract chunks that reconstruct exactly") {
    val sp = spark
    import sp.implicits._
    val chunks = SparkEntry.queries("q105_chunk_windows")(sp, sf)
      .select("doc_id", "chunk_id", "start_tok", "n_tok", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.toSeq.map(r => (r._2, r._3, r._4, r._5))
      }
    val docs = Tables.documents(sp, sf)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toMap
    assert(chunks.keySet == docs.keySet, "chunking dropped or invented documents")
    chunks.foreach { case (id, rows) => checkDoc(toks(docs(id)), rows) }
    // the fixture must actually exercise the multi-chunk path
    assert(chunks.values.exists(_.size > 1), "no document spans two windows — spec is vacuous")
  }

  test("q105: edge shapes — empty, one token, exactly W, W+1, W+S, and a long document") {
    val sp = spark
    import sp.implicits._
    val word = "w"
    val shapes = Seq(0, 1, W - 1, W, W + 1, W + S, W + S + 1, 5 * W)
    val docs = shapes.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)(word).mkString(" "))
    }.toDF("doc_id", "text")
    val out = Selection.chunkDocs(docs)
      .select("doc_id", "chunk_id", "start_tok", "n_tok", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1)
    shapes.zipWithIndex.foreach { case (n, i) =>
      val rows = out(i.toLong).toSeq.map(r => (r._2, r._3, r._4, r._5))
      checkDoc(Array.fill(n)(word), rows)
      if (n <= W) assert(rows.size == 1, s"n=$n must be a single chunk")
    }
    // W+1 spills into a second chunk that still starts at the stride
    assert(out(shapes.indexOf(W + 1).toLong).size == 2)
  }

  test("q105 chunker is streaming-ready: streamed chunks equal batch exactly") {
    // the chunker is stateless and its unit of work is one document,
    // so the SAME code is the streaming twin — no state, no watermark,
    // and any micro-batch delivery order converges to batch q105
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val docs = Tables.documents(sp, sf)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = Selection.chunkDocs(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("chunk_twin")
      .outputMode("append").start()
    try {
      docs.grouped((docs.length + 2) / 3).foreach { c =>
        mem.addData(c.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = sp.table("chunk_twin")
        .as[(Long, Long, Long, Long, String)].collect().sorted.toSeq
      val batch = SparkEntry.queries("q105_chunk_windows")(sp, sf)
        .as[(Long, Long, Long, Long, String)].collect().sorted.toSeq
      assert(streamed == batch, "streamed chunking diverged from batch q105")
    } finally q.stop()
  }
}
