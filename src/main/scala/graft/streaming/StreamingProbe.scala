package graft.streaming

import graft.queries.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming delta-vs-index near-dup probe — the streaming twin of
  * batch q69's band probe, and the catalog's STREAM-STATIC JOIN
  * surface: arriving documents are signature-banded statelessly
  * (`Dedup.bandEntries`, the same mapPartitions stage batch and
  * streaming dedup already share) and joined against a FROZEN band
  * index, a static batch relation (in production: the stored output of
  * the index build, partitioned by band_key).
  *
  * Unlike `StreamingDedup` (which grows the index from the stream
  * itself, with state), this probe holds NO state at all: the index is
  * fixed, so each micro-batch is a pure stream-static equi-join — the
  * Structured Streaming shape for "check new data against a reference
  * table" that needs neither watermark nor timeout. One row per
  * (arriving doc, index doc) band collision; the min-per-doc verdict
  * is a downstream aggregation (batch q69's `near_of`), kept out of
  * the stream so append mode stays aggregation-free.
  */
object StreamingProbe {

  def probe(deltaDocs: DataFrame, frozenBands: DataFrame): DataFrame =
    Dedup.bandEntries(deltaDocs)
      .join(frozenBands.select(col("band_key"),
        col("doc_id").as("idx_doc")), "band_key")
      // self-match guard (r07 review): under at-least-once redelivery
      // (or an index rebuilt from already-ingested docs) a document
      // meets ITSELF in the frozen index — every band collides and the
      // downstream min-per-doc verdict would flag the original as a
      // duplicate of itself. Batch q69 never sees this only because
      // its delta/frozen sets are disjoint by construction
      .filter(col("doc_id") =!= col("idx_doc"))
      .select(col("doc_id"), col("idx_doc"))
}
