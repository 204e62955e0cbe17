package graft

import graft.sources.DocIngest
import org.apache.spark.sql.functions._

/** The JSONL front door: schema-conforming lines land as documents
  * (defaults derived), malformed or requirement-violating lines land in
  * quarantine WITH their original bytes — nothing is silently lost, the
  * two relations tile the input exactly.
  */
class DocIngestSpec extends SparkSpec {

  test("good lines parse with derived defaults; bad lines quarantine losslessly") {
    val sp = spark
    import sp.implicits._
    val dir = tmpDir("jsonl-in")
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}""",
      """{"doc_id": 2, "text": "sans metadata"}""", // lang/source/n_chars derived
      """{"doc_id": 3, "text": "with count", "n_chars": 999}""", // producer count kept
      """{"truncated": """, // malformed JSON
      """{"doc_id": 4}""", // missing text: requirement violation
      """{"text": "missing id"}""", // missing doc_id
      """not json at all""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))

    val got = DocIngest.jsonl(sp, dir)
    val docs = got.docs.orderBy("doc_id")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(docs == Seq(
      (1L, "hello world", "en", "web", 11L),
      (2L, "sans metadata", "und", "unknown", 13L),
      (3L, "with count", "en", "unknown", 999L)
        .copy(_3 = "und")), s"$docs")
    val bad = got.quarantine.select("line").as[String].collect().toSet
    // VERBATIM bytes for every rejected line — malformed JSON and
    // requirement-violating valid JSON alike (a re-serialized row would
    // lose unknown fields, exactly the evidence a producer needs)
    assert(bad == lines.drop(3).toSet, s"$bad")
    // nothing lost: the two relations tile the input
    assert(got.docs.count() + got.quarantine.count() == lines.size)
    // quarantine carries the source file
    assert(got.quarantine.select("file").as[String].collect()
      .forall(_.endsWith("part-0.jsonl")))
  }

  test("the ingested relation feeds the catalog operators directly") {
    val sp = spark
    import sp.implicits._
    val dir = tmpDir("jsonl-feed")
    val body = "the quick brown fox jumps over a lazy dog and again " * 10
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "d.jsonl"),
      (0 until 20).map(i =>
        s"""{"doc_id": $i, "text": "${body.trim} v$i"}""")
        .mkString("\n").getBytes("UTF-8"))
    val docs = DocIngest.jsonl(sp, dir).docs
    // the q30 exact-dedup shape runs unchanged on the ingested relation
    val distinctContents = docs
      .groupBy(md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))))
      .count()
    assert(distinctContents.count() == 20)
  }

  test("q97 fixture dumps are dataset-keyed: interleaved SFs cannot clobber") {
    import graft.queries.Ingest
    val sfA = "/root/testdata/sf0.001"
    val sfB = "/root/testdata/sf0.01"
    // keyed and stable: different datasets → different dumps, same
    // dataset → the same dump (runs legitimately share + overwrite it)
    assert(Ingest.q97Dir(sfA) != Ingest.q97Dir(sfB))
    assert(Ingest.q97Dir(sfA) == Ingest.q97Dir(sfA))
    // the r07-verdict race: A materializes its dump, B (another SF)
    // runs the same entry, THEN A's result is read. With one fixed
    // path, B's overwrite lands between A's write and read and A
    // silently reads B's corpus; with keyed paths A is unaffected.
    val q = SparkEntry.queries("q97_jsonl_ingest")
    val a = q(spark, sfA) // dump for A written eagerly here
    q(spark, sfB).write.format("noop").mode("overwrite").save() // interleaver
    val interleaved = a.collect().toSeq
    val fresh = q(spark, sfA).collect().toSeq
    assert(interleaved == fresh, "interleaved read diverged from a clean run")
  }

  test("writeSplit materializes both relations in one partitioned job") {
    val sp = spark
    import sp.implicits._
    val dir = tmpDir("jsonl-split-in")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "d.jsonl"),
      Seq(
        """{"doc_id": 1, "text": "alpha"}""",
        """broken line""",
        """{"doc_id": 2, "text": "beta", "lang": "en"}""")
        .mkString("\n").getBytes("UTF-8"))
    val out = tmpDir("jsonl-split-out")
    DocIngest.jsonl(sp, dir).writeSplit(out)
    val names = new java.io.File(out).listFiles
      .filter(_.isDirectory).map(_.getName).toSet
    assert(names == Set("_ok=true", "_ok=false"), s"$names")
    val ok = sp.read.parquet(s"$out/_ok=true")
    val bad = sp.read.parquet(s"$out/_ok=false")
    assert(ok.count() == 2 && bad.count() == 1)
    assert(bad.select("line").as[String].head() == "broken line")
    assert(ok.select("lang").as[String].collect().sorted.toSeq == Seq("en", "und"))
  }
}
