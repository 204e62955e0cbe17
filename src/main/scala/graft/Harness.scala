package graft

import org.apache.spark.sql.SparkSession

/** Shared measurement-harness discipline — ONE spelling (r07 review:
  * Bench, Verify, and ScaleSlope each carried their own copy of the
  * settle/only-filter idioms, so a fix to either — e.g. the
  * blocking=true unpersist lesson encoded in Bench's history — had to
  * be applied in three places or the tools silently measured
  * differently).
  */
object Harness {

  /** Per-execution cleanup, run OUTSIDE timed regions: a rep must not
    * inherit the previous execution's localCheckpoint-pinned scratch
    * RDDs (old-gen pressure that surfaces as single-rep tails), nor
    * its uncollected garbage. blocking=true: async removal would
    * overlap the next timed rep.
    */
  def settle(spark: SparkSession, blocking: Boolean = true): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = blocking))
    spark.catalog.clearCache()
    // gc only for the TIMED harnesses (blocking mode): an untimed tool
    // like Verify wants the cheap non-blocking release, not a full gc
    // per entry (r08 review made this the one spelling Verify uses too)
    if (blocking) System.gc()
  }

  /** SPARK_GRAFT_ONLY=q31,q37 restricts to matching name prefixes
    * (local iteration); unset = everything.
    */
  def onlyFilter(names: Seq[String]): Seq[String] = {
    // an EMPTY value (wrapper scripts exporting SPARK_GRAFT_ONLY="$X"
    // with X unset) means "no filter", not "zero queries" — a silent
    // empty selection would zero a round's bench/correctness (r08)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    names.filter(n => only.forall(_.exists(n.startsWith)))
  }
}
