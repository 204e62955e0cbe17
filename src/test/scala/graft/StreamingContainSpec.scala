package graft

import graft.queries.Dedup
import graft.streaming.StreamingContain
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming containment twin must converge with batch q127 on the
  * (delta ⊂ frozen-container) pairs under chunked delivery, find every
  * true engulfment (the recall-1.0 guarantee survives the frozen-df
  * probe selection), stay silent for unrelated arrivals, and re-emit
  * identical verdicts on redelivery (stateless).
  */
class StreamingContainSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  private def words(pfx: String, n: Int): String =
    (0 until n).map(i => s"$pfx$i").mkString(" ")

  test("streamed engulfment verdicts equal batch q127's frozen-side pairs under 2-chunk delivery; redelivery is idempotent") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    // frozen corpus: three containers with disjoint vocabularies
    val frozen = Seq(1L -> words("a", 40), 2L -> words("b", 40),
      3L -> words("c", 40))
    val idx = Dedup.buildContainIndex(docsDf(frozen))
    // delta: snippets of containers 1 and 3, one unrelated doc
    val delta = Seq(101L -> words("a", 12), 103L -> words("c", 15),
      200L -> words("z", 20))
    val mem = MemoryStream[(Long, String)]
    val out = tmpDir("contain-stream")
    val q = StreamingContain.start(
      mem.toDF().toDF("doc_id", "text"), idx, out)
    try {
      delta.grouped(2).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // redeliver the first chunk: stateless probe, identical verdicts
      mem.addData(delta.take(2).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = sp.read.parquet(out)
      .as[(Long, Long, Long, Long, Double)].collect()
    // duplicates from the redelivery dedup to the same verdict set
    val got = streamed.toSet
    assert(streamed.length > got.size,
      "redelivery fixture must actually produce duplicate rows")
    val batch = Dedup.containmentReport(docsDf(frozen ++ delta))
      .as[(Long, Long, Long, Long, Double)].collect()
      .filter(r => r._1 > 100L && r._2 <= 3L).toSet
    assert(batch.nonEmpty)
    assert(got == batch,
      s"streamed verdicts diverged from batch:\n$got\nvs\n$batch")
    assert(got.map(_._1) == Set(101L, 103L) &&
      got.forall(_._5 == 1.0), got.mkString(";"))
  }

  test("a delta gram absent from the frozen index never probes — unrelated arrivals are silent, not wrong") {
    val sp = spark
    import sp.implicits._
    val idx = Dedup.buildContainIndex(docsDf(Seq(1L -> words("a", 40))))
    val verdicts = StreamingContain.probeBatch(
        docsDf(Seq(200L -> words("z", 30))), idx)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(verdicts.isEmpty, verdicts.mkString(";"))
  }
}
