package graft.streaming

import graft.queries.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One (band_key, doc_id) posting — the unit of the incremental index. */
final case class BandEntry(band_key: String, doc_id: Long)

/** A near-dup candidate: two docs sharing `band_key` (doc_a < doc_b). */
final case class BandCandidate(doc_a: Long, doc_b: Long, band_key: String)

/** Streaming MinHash/LSH near-dup — the streaming twin of batch q32, so
  * dedup is not batch-only (the 100 TB/day ingestion story).
  *
  * Shape: signatures are STATELESS per-row expressions
  * (`Dedup.bandEntries` — bit-identical band keys to q32), so the only
  * state in the stream is the band index itself: per band bucket, the
  * doc ids seen so far. `flatMapGroupsWithState` maintains that index
  * incrementally and emits a candidate pair the moment a new document
  * lands in a non-empty bucket — each pair exactly once, across any
  * micro-batch boundary.
  *
  * State per bucket is capped at `maxBucket` doc ids (the df-cap
  * argument from q31 applied to band buckets): a degenerate bucket —
  * boilerplate documents hashing together — would otherwise grow state
  * and emit O(n²) pairs for no near-dup signal. A saturated bucket is a
  * stop-bucket: further members are dropped, so total state is bounded
  * by buckets × maxBucket ids regardless of stream length.
  */
object StreamingDedup {

  val DefaultMaxBucket = 1000

  /** Stateless signature stage over a streaming (or batch) `(doc_id,
    * text)` relation.
    */
  def bandEntries(docs: DataFrame): Dataset[BandEntry] = {
    import docs.sparkSession.implicits._
    Dedup.bandEntries(docs).as[BandEntry]
  }

  /** The incrementally-maintained band index. Input may carry replayed
    * docs (at-least-once sources): a doc id already present in its
    * bucket re-emits nothing (membership via a hash set, not a linear
    * scan of the bucket).
    *
    * `stateTtl`: optional processing-time TTL per bucket. On an
    * unbounded stream, NoTimeout state pins every band bucket ever seen
    * forever; with a TTL, a bucket idle that long is evicted, so state
    * is bounded by the ACTIVE working set. The documented trade: a
    * near-dup pair whose members arrive further apart than the TTL is
    * not emitted — the dedup horizon is the TTL, which is exactly the
    * contract batch re-dedup (q32 over the accumulated corpus) covers.
    */
  def candidates(entries: Dataset[BandEntry],
      maxBucket: Int = DefaultMaxBucket,
      stateTtl: Option[java.time.Duration] = None): Dataset[BandCandidate] = {
    import entries.sparkSession.implicits._
    val timeoutKind = stateTtl.fold(GroupStateTimeout.NoTimeout())(_ =>
      GroupStateTimeout.ProcessingTimeTimeout())
    entries.groupByKey(_.band_key)
      .flatMapGroupsWithState[Seq[Long], BandCandidate](
        OutputMode.Append(), timeoutKind) {
        (key, chunk, state) =>
          if (state.hasTimedOut) {
            state.remove() // idle bucket: evict, emit nothing
            Iterator.empty
          } else {
            val seen = state.getOption.getOrElse(Seq.empty)
            val seenSet = scala.collection.mutable.Set(seen: _*)
            val fresh = chunk.map(_.doc_id).toSeq.distinct.sorted
              .filterNot(seenSet.contains)
            val out = Seq.newBuilder[BandCandidate]
            var bucket = seen
            fresh.foreach { d =>
              if (bucket.size < maxBucket) {
                bucket.foreach { a =>
                  out += BandCandidate(math.min(a, d), math.max(a, d), key)
                }
                bucket = bucket :+ d
                seenSet += d
              } // else: stop-bucket, no near-dup signal left in it
            }
            state.update(bucket)
            stateTtl.foreach(t => state.setTimeoutDuration(t.toMillis))
            out.result().iterator
          }
      }
  }
}
