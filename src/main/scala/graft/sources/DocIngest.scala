package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL ingestion front door for the documents pipeline — how a corpus
  * actually ARRIVES before any catalog operator sees it: newline-
  * delimited JSON (the lingua franca of web-scale text dumps), read
  * against the DECLARED documents schema with every rejected line
  * QUARANTINED AS ITS ORIGINAL BYTES — not silently dropped, not
  * run-aborting, not re-serialized.
  *
  * At 100 TB the failure mode this guards is silent row loss: Spark's
  * default PERMISSIVE json mode nulls out unparseable rows,
  * DROPMALFORMED erases them, FAILFAST kills a day-long job on one bad
  * line — and `_corrupt_record` preserves originals only for MALFORMED
  * JSON, so a schema-violating valid-JSON line (a typo'd field name)
  * would lose its payload to re-serialization. The shape here reads the
  * dump as TEXT and parses with `from_json`, so the original line
  * column exists for every row:
  *
  *   - `docs`: schema-conforming rows (`doc_id` and `text` required),
  *     defaults derived (`lang` 'und', `source` 'unknown', `n_chars`
  *     from `length(text)`);
  *   - `quarantine`: the VERBATIM input line plus the source file —
  *     whether the line was malformed JSON or valid JSON missing a
  *     requirement, producers debug from the actual bytes.
  *
  * The two are LAZY views over one declared scan — materializing both
  * independently therefore reads the dump twice (a union of the two
  * views would too: file scans are not reused across union branches).
  * [[Ingested.writeSplit]] is the single-pass path: ONE plan over the
  * raw scan tags every row with its validity and writes both outputs
  * hive-partitioned on it — the shape a 100 TB ingest should run.
  */
object DocIngest {

  val dataSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val okCond =
    col("p").isNotNull &&
      col("p.doc_id").isNotNull && col("p.text").isNotNull

  // the ONE spelling of the parsed-document projection (defaults
  // included) — shared by `docs` and `writeSplit` so the two output
  // surfaces cannot silently drift on a default/derivation change
  // (r08 review)
  private val docCols = Seq(
    col("p.doc_id").as("doc_id"), col("p.text").as("text"),
    coalesce(col("p.lang"), lit("und")).as("lang"),
    coalesce(col("p.source"), lit("unknown")).as("source"),
    coalesce(col("p.n_chars"), length(col("p.text")).cast("long"))
      .as("n_chars"))

  final class Ingested private[DocIngest] (raw: DataFrame) {

    /** Schema-conforming rows with defaults derived. */
    def docs: DataFrame =
      raw.filter(okCond).select(docCols: _*)

    /** Rejected rows — ALWAYS the verbatim input line. */
    def quarantine: DataFrame =
      raw.filter(!okCond)
        .select(col("value").as("line"), col("_file").as("file"))

    /** ONE pass over the input materializing BOTH relations: a single
      * plan over the raw scan tags each row `_ok` and writes
      * hive-partitioned on it — docs land under `_ok=true`, quarantine
      * (verbatim line + file) under `_ok=false`, one job, one read.
      */
    def writeSplit(outDir: String): Unit =
      raw.select(okCond.as("_ok") +: docCols :+
          when(!okCond, col("value")).as("line") :+
          when(!okCond, col("_file")).as("file"): _*)
        .write.mode("overwrite").partitionBy("_ok").parquet(outDir)
  }

  def jsonl(spark: SparkSession, path: String): Ingested = {
    // text scan + from_json, NOT the json reader: the original line must
    // exist as a column for EVERY row so quarantine is verbatim. A
    // malformed line parses to a null struct; a valid-JSON line missing
    // a requirement fails okCond — both quarantine with their bytes.
    new Ingested(spark.read.text(path)
      .withColumn("_file", input_file_name())
      .withColumn("p", from_json(col("value"), dataSchema)))
  }
}
