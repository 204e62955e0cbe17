package graft

import org.apache.spark.sql.functions._
import graft.queries.TextAnalysis

/** Behavioral gates for the q126 C4/FineWeb rule battery: each rule
  * trips on exactly its trigger, the keep verdict is the conjunction,
  * and a null page is a deterministic drop (the ingest defense).
  */
class C4FilterSpec extends SparkSpec {

  private def flags(pages: Seq[(Long, String)])
      : Map[Long, (Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)] = {
    val sp = spark
    import sp.implicits._
    TextAnalysis.c4Flags(pages.toDF("doc_id", "page"))
      .select(col("doc_id"), col("r_terminal"), col("r_words"),
        col("r_js"), col("r_lorem"), col("r_brace"), col("r_policy"),
        col("keep"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6), r.getBoolean(7))))
      .toMap
  }

  private val longBody = (0 until 60).map(i => s"w$i").mkString(" ")

  test("each rule trips on exactly its trigger; the verdict is the conjunction") {
    val f = flags(Seq(
      1L -> (longBody + "."), // clean keeper
      2L -> longBody, // no terminal punctuation
      3L -> (longBody + " javascript ."),
      4L -> (longBody + " lorem ipsum ."),
      5L -> (longBody + " config { a } ."),
      6L -> (longBody + " our cookie policy applies ."),
      7L -> "too short ."))
    assert(f(1L) == ((true, true, true, true, true, true, true)), f(1L))
    assert(!f(2L)._1 && !f(2L)._7 && f(2L)._2, f(2L))
    assert(!f(3L)._3 && !f(3L)._7 && f(3L)._1, f(3L))
    assert(!f(4L)._4 && !f(4L)._7, f(4L))
    assert(!f(5L)._5 && !f(5L)._7, f(5L))
    assert(!f(6L)._6 && !f(6L)._7, f(6L))
    assert(!f(7L)._2 && !f(7L)._7 && f(7L)._1, f(7L))
  }

  test("a null page is a deterministic drop, never a crash") {
    val f = flags(Seq(8L -> null.asInstanceOf[String]))
    assert(!f(8L)._7 && !f(8L)._1 && !f(8L)._2, f(8L))
    // absence rules hold vacuously on the empty page
    assert(f(8L)._3 && f(8L)._4 && f(8L)._5 && f(8L)._6, f(8L))
  }

  test("the battery is its own streaming twin: pure column expressions converge exactly under chunked delivery") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val docs = Tables.documents(sp, "/root/testdata/sf0.001")
    val all = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = TextAnalysis.c4Flags(
        mem.toDF().toDF("doc_id", "text")
          .select(col("doc_id"),
            TextAnalysis.c4Page(col("doc_id"), col("text")).as("page")))
      .select(col("doc_id"), col("keep"))
      .writeStream.format("memory").queryName("c4_stream")
      .outputMode("append").start()
    try {
      all.grouped((all.length + 1) / 2).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = sp.table("c4_stream")
        .as[(Long, Boolean)].collect().toSet
      val batch = SparkEntry.queries("q126_c4_filters")(
          sp, "/root/testdata/sf0.001")
        .select(col("doc_id"), col("keep"))
        .as[(Long, Boolean)].collect().toSet
      assert(streamed == batch, "streamed verdicts diverged from batch")
      assert(batch.exists(_._2) && batch.exists(!_._2))
    } finally q.stop()
  }

  test("the corpus battery is non-degenerate: every rule observes both outcomes") {
    val out = SparkEntry.queries("q126_c4_filters")(
      spark, "/root/testdata/sf0.01")
    Seq("r_terminal", "r_words", "r_js", "r_lorem", "r_brace",
      "r_policy", "keep").foreach { c =>
      val n = out.select(col(c)).distinct().count()
      assert(n == 2, s"rule $c is vacuous on the fixture ($n outcomes)")
    }
  }
}
