package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark query over the testdata star schema plus an
  * optional DuckDB-oracle SQL twin. Entries with `oracle = None` get the
  * driver's weaker rows-only check (used for ops whose exact output is not
  * SQL-expressible, e.g. MinHash signatures).
  */
final case class CatalogEntry(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def entries: Seq[CatalogEntry]
}
