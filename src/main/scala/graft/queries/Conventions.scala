package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Conventions that make Spark results hash-identical to the DuckDB oracle.
  *
  * - Double-typed measures are summed through an exact DECIMAL cast and only
  *   then converted back to DOUBLE. Raw double sums are order-dependent
  *   (Spark's partial aggregation adds in partition order, DuckDB in scan
  *   order) and would differ in low bits run-to-run; decimal addition is
  *   associative so both engines produce the identical exact value.
  * - Averages are computed as exact-decimal-sum / count in DOUBLE — one IEEE
  *   division of identical operands is deterministic in both engines.
  * - Timestamps are never emitted raw: the `events` table is nanosecond
  *   precision, which Spark truncates to microseconds while DuckDB keeps ns.
  *   Emit `date_format(...)` strings or DATE casts instead.
  * - Every query ends in a total ORDER BY (all key columns, tie-broken to
  *   uniqueness) so row order matches the oracle's ORDER BY.
  */
object Conventions {
  /** Exact decimal sum of a double column, emitted as DOUBLE. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** SQL twin of [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Deterministic average: exact decimal sum divided by count, in
    * DOUBLE — COMPOSED from dsum so the exactness-critical idiom has
    * one spelling (two inline copies could drift under a future dsum
    * fix, breaking only the averaging oracles — r07 review).
    */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))

  def davgSql(expr: String, scale: Int = 2): String =
    s"${dsumSql(expr, scale)} / COUNT(*)"
}
