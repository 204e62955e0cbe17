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
  * shape here is PERMISSIVE + `_corrupt_record`, split into two
  * relations in ONE pass over the files:
  *
  *   - `docs`: schema-conforming rows, `n_chars` derived when the
  *     producer omitted it (`length(text)`), `doc_id` required;
  *   - `quarantine`: the ORIGINAL malformed line plus the source file,
  *     so producers can be debugged without re-reading the dump.
  *
  * Both come from the same scan (column pruning still applies — the
  * corrupt column materializes only for rows that fail the schema).
  */
object DocIngest {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  final case class Ingested(docs: DataFrame, quarantine: DataFrame)

  def jsonl(spark: SparkSession, path: String): Ingested = {
    val raw = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .withColumn("_file", input_file_name())
    // a corrupt line parses to all-null data columns + the raw line; a
    // VALID line may also omit fields, so the split key is the corrupt
    // column AND the hard requirements (doc_id, text present)
    val bad = raw.filter(
      col("_corrupt_record").isNotNull ||
        col("doc_id").isNull || col("text").isNull)
      .select(
        coalesce(col("_corrupt_record"),
          to_json(struct(col("doc_id"), col("text"), col("lang"),
            col("source"), col("n_chars")))).as("line"),
        col("_file").as("file"))
    val good = raw.filter(
      col("_corrupt_record").isNull &&
        col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("text"),
        coalesce(col("lang"), lit("und")).as("lang"),
        coalesce(col("source"), lit("unknown")).as("source"),
        coalesce(col("n_chars"), length(col("text")).cast("long"))
          .as("n_chars"))
    Ingested(good, bad)
  }
}
