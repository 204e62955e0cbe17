package graft.streaming

import graft.queries.{Dedup, Selection}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** A shard's packer state between micro-batches: the next fresh bin id
  * and the open bins as parallel (id, used-token) arrays — at most
  * `Selection.OpenBins` entries per shard, FOREVER, regardless of
  * stream length.
  */
final case class BinPackState(nextBin: Long, binIds: Array[Long],
    used: Array[Long], hiTok: Long = Long.MaxValue,
    hiDoc: Long = Long.MinValue)

/** A document's slot in the packed output: bin `bin_id` of its shard,
  * starting at `bin_off`, never straddling a bin boundary.
  */
final case class BinPlacement(doc_id: Long, shard: Long, bin_id: Long,
    bin_off: Long, n_tok: Long, truncated: Boolean)

/** Streaming boundary-respecting packing — the q77 twin, completing the
  * packing family's streaming story (q62 ↔ StreamingPack, q77 ↔ this):
  * an ingestion pipeline can place every arriving document into a
  * never-split training sequence the moment it lands.
  *
  * Shape: the token/shard projection is the same stateless stage as
  * StreamingPack's; the per-shard state is the SAME bounded best-fit
  * machine batch q77 runs (`Selection.BestFitBins` — one
  * implementation, two engines), carried across micro-batches by
  * `flatMapGroupsWithState`. Within each micro-batch a shard's chunk
  * packs biggest-first (micro-batch FFD); bins stay open across
  * batches, so later arrivals fill earlier bins' holes.
  *
  * Determinism contract: output depends only on the arrival chunking,
  * and a stream delivered in batch q77's scan order (capped token
  * count descending, then doc_id) reproduces batch q77's placements
  * EXACTLY across any chunking of that order — StreamingBinPackSpec
  * pins the convergence.
  *
  * Replay contract (at-least-once sources — r08 review, the
  * StreamingPack discipline): under the in-order delivery the
  * convergence contract already assumes, a REDELIVERED document
  * arrives with a (capped-tokens-desc, doc_id) scan key at or below
  * its shard's high-water mark and is DROPPED — re-placing it would
  * emit a second conflicting BinPlacement and double-consume bin
  * capacity. Costs two longs of state per shard.
  */
object StreamingBinPack {

  def placements(toks: Dataset[PackInput],
      budget: Long = Dedup.PackBudget): Dataset[BinPlacement] = {
    import toks.sparkSession.implicits._
    toks.groupByKey(_.shard)
      .flatMapGroupsWithState[BinPackState, BinPlacement](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard, chunk, state) =>
          val st = state.getOption
            .getOrElse(BinPackState(0L, Array.empty, Array.empty))
          val bins = new Selection.BestFitBins(st.nextBin,
            scala.collection.mutable.ArrayBuffer
              .from(st.binIds.zip(st.used)))
          var hiTok = st.hiTok
          var hiDoc = st.hiDoc
          val out = chunk.toSeq
            .sortBy(p => (-math.min(p.n_tok, budget), p.doc_id))
            .flatMap { p =>
              val n = math.min(p.n_tok, budget)
              // scan key (-n, doc_id): at or below the high-water mark
              // = replayed under in-order delivery — drop, never
              // re-place (hiTok stores the capped count, so the test
              // is n > hiTok-is-ahead, i.e. key (-n, id) > (-hiTok, hiDoc))
              if (n > hiTok || (n == hiTok && p.doc_id <= hiDoc)) None
              else {
                hiTok = n
                hiDoc = p.doc_id
                val (binId, off) = bins.place(n, budget)
                Some(BinPlacement(p.doc_id, shard, binId, off, n,
                  p.n_tok > budget))
              }
            }
          state.update(BinPackState(bins.nextBin,
            bins.open.map(_._1).toArray, bins.open.map(_._2).toArray,
            hiTok, hiDoc))
          out.iterator
      }
  }
}
