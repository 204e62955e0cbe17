package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL ingestion front door for the documents pipeline — how a corpus
  * actually ARRIVES before any catalog operator sees it: newline-
  * delimited JSON (the lingua franca of web-scale text dumps), read
  * against the DECLARED documents schema with malformed lines
  * QUARANTINED, not silently dropped and not run-aborting.
  *
  * At 100 TB the failure mode this guards is silent row loss: Spark's
  * default PERMISSIVE mode nulls out unparseable rows, DROPMALFORMED
  * erases them, FAILFAST kills a day-long job on one bad line. The
  * shape here is PERMISSIVE + `_corrupt_record` split into two
  * relations:
  *
  *   - `docs`: schema-conforming rows, `n_chars` derived when the
  *     producer omitted it (`length(text)`), `doc_id` required;
  *   - `quarantine`: the ORIGINAL malformed line plus the source file,
  *     so producers can be debugged without re-reading the dump.
  *
  * The two are LAZY views over one declared scan — materializing both
  * independently therefore reads the dump twice (a union of the two
  * views would too: file scans are not reused across union branches).
  * [[Ingested.writeSplit]] is the single-pass path: ONE plan over the
  * raw scan tags every row with its validity and writes both outputs
  * hive-partitioned on it — the shape a 100 TB ingest should run.
  */
object DocIngest {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  private val okCond =
    col("_corrupt_record").isNull &&
      col("doc_id").isNotNull && col("text").isNotNull

  final class Ingested private[DocIngest] (raw: DataFrame) {

    /** Schema-conforming rows with defaults derived. */
    def docs: DataFrame =
      raw.filter(okCond)
        .select(col("doc_id"), col("text"),
          coalesce(col("lang"), lit("und")).as("lang"),
          coalesce(col("source"), lit("unknown")).as("source"),
          coalesce(col("n_chars"), length(col("text")).cast("long"))
            .as("n_chars"))

    /** Malformed / requirement-violating rows, original bytes kept. */
    def quarantine: DataFrame =
      raw.filter(!okCond)
        .select(
          coalesce(col("_corrupt_record"),
            to_json(struct(col("doc_id"), col("text"), col("lang"),
              col("source"), col("n_chars")))).as("line"),
          col("_file").as("file"))

    /** ONE pass over the input materializing BOTH relations: a single
      * plan over the raw scan tags each row `_ok` and writes
      * hive-partitioned on it — docs land under `_ok=true`, quarantine
      * (original line + file) under `_ok=false`, one job, one read.
      */
    def writeSplit(outDir: String): Unit =
      raw.select(
        okCond.as("_ok"),
        col("doc_id"), col("text"),
        coalesce(col("lang"), lit("und")).as("lang"),
        coalesce(col("source"), lit("unknown")).as("source"),
        coalesce(col("n_chars"), length(col("text")).cast("long"))
          .as("n_chars"),
        when(!okCond,
          coalesce(col("_corrupt_record"),
            to_json(struct(col("doc_id"), col("text"), col("lang"),
              col("source"), col("n_chars"))))).as("line"),
        when(!okCond, col("_file")).as("file"))
        .write.mode("overwrite").partitionBy("_ok").parquet(outDir)
  }

  def jsonl(spark: SparkSession, path: String): Ingested = {
    // a corrupt line parses to all-null data columns + the raw line; a
    // VALID line may also omit fields, so the split key is the corrupt
    // column AND the hard requirements (doc_id, text present)
    new Ingested(spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .withColumn("_file", input_file_name()))
  }
}
