package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-area modules; every entry either
  * hash-matches a DuckDB oracle (`oracleSql`) or is rows-only checked.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    Relational,
    TextAnalysis,
    Dedup,
    SuffixDedup,
    Similarity,
    Events,
    Media,
    Selection,
    Chain,
    Ingest,
  )

  private lazy val catalog: Seq[CatalogEntry] = modules.flatMap(_.entries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    catalog.head.query(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(e => e.name -> e.query).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(e => e.oracle.map(e.name -> _)).toMap
}
