package graft.streaming

import graft.queries.{Dedup, Selection}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.util.sketch.BloomFilter

/** Stateless per-document signals + the exact-dup key, pre-fusion. */
final case class DocSignals(doc_id: Long, norm_md5: String, base: Int)

/** [[DocSignals]] + the document's event time, for the watermarked
  * variant ([[StreamingCurate.auditEventTime]]).
  */
final case class TimedSignals(doc_id: Long, norm_md5: String, base: Int,
    event_time: java.sql.Timestamp)

/** One streamed audit verdict — bits 0-3 of batch q79's `reasons`. */
final case class CurateVerdict(doc_id: Long, reasons: Int, keep: Boolean)

/** One streamed decont-cut rewrite — batch q104's row shape. */
final case class CutDoc(doc_id: Long, n_cut: Long, clean_text: String)

/** Frozen eval-shard gram membership, sized for streaming broadcast:
  * batch q80's two-tier shape (Bloom PRUNE → exact CONFIRM) folded
  * into one immutable value.
  *
  *   - Tier 1: the spark-sketch [[BloomFilter]] built DISTRIBUTEDLY
  *     (`DataFrameStatFunctions.bloomFilter` runs as a treeAggregate —
  *     gram strings never reach the driver). No false negatives, so a
  *     real hit is never lost; ~fpp of probes fall through to tier 2.
  *   - Tier 2: the md5-128 of every gram as a SORTED pair of longs —
  *     16 bytes per gram, primitive arrays, zero per-entry object
  *     overhead — binary-searched only for bloom survivors. md5-128
  *     as content identity is this repo's established convention
  *     (q30/q61 `norm_md5` key the exact dedup on it), so membership
  *     is exact in the same sense the batch audit's is, and the
  *     streamed `reasons` stay bit-identical to batch q79's.
  *
  * Why an index rather than a per-micro-batch confirm JOIN (q80's
  * batch tier 2): a stream-static join would re-shuffle every
  * micro-batch's gram stream, and the per-doc hit count it feeds is
  * an aggregation — a second stateful operator that Structured
  * Streaming cannot place before the dedup `flatMapGroupsWithState`.
  * The index keeps contamination a narrow per-partition pass and the
  * dedup pass the query's ONLY stateful operator. Memory: ≈16 B/gram
  * + bloom bits, vs ≥ ~100 B/gram for a driver-collected
  * `Set[String]` (boxed entries + hash table) — roughly an order of
  * magnitude more eval shard per GB of broadcast. Beyond THAT, the
  * batch q80 bloom-prune re-audit over the accumulated corpus is the
  * scale path, as the class doc states for bit 4.
  */
final class EvalGramIndex private (
    bloom: BloomFilter, h1: Array[Long], h2: Array[Long])
    extends Serializable {

  def size: Int = h1.length

  /** Approximate broadcast weight: bloom bits + 16 B per gram. */
  def approxBytes: Long = bloom.bitSize() / 8 + 16L * h1.length

  def contains(g: String): Boolean =
    bloom.mightContainString(g) && {
      val (a, b) = EvalGramIndex.md5Pair(g)
      var lo = 0
      var hi = h1.length - 1
      var found = false
      while (!found && lo <= hi) {
        val mid = (lo + hi) >>> 1
        var c = java.lang.Long.compareUnsigned(h1(mid), a)
        if (c == 0) c = java.lang.Long.compareUnsigned(h2(mid), b)
        if (c == 0) found = true
        else if (c < 0) lo = mid + 1
        else hi = mid - 1
      }
      found
    }
}

object EvalGramIndex {
  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5-128 of the UTF-8 bytes as (hi, lo) — identical to Spark SQL's
    * `unhex(md5(s))` split big-endian, which is how [[of]] receives
    * the digests from the distributed build.
    */
  private[streaming] def md5Pair(g: String): (Long, Long) = {
    val d = Md5.get().digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bb = java.nio.ByteBuffer.wrap(d)
    (bb.getLong(0), bb.getLong(8))
  }

  private[streaming] def of(pairs: Array[(Long, Long)],
      bloom: BloomFilter): EvalGramIndex = {
    val sorted = pairs.sortWith { case ((a1, b1), (a2, b2)) =>
      val c = java.lang.Long.compareUnsigned(a1, a2)
      if (c != 0) c < 0 else java.lang.Long.compareUnsigned(b1, b2) < 0
    }
    new EvalGramIndex(bloom, sorted.map(_._1), sorted.map(_._2))
  }

  /** Driver-side build from an in-memory gram set (tests / tools). */
  def ofStrings(grams: Set[String]): EvalGramIndex = {
    val bloom = BloomFilter.create(math.max(grams.size.toLong, 1L), 0.03)
    grams.foreach(bloom.putString)
    of(grams.toArray.map(md5Pair), bloom)
  }

  val empty: EvalGramIndex = ofStrings(Set.empty)
}

/** Streaming curation AUDIT — the streaming twin of batch q79's
  * lexical legs: every arriving document gets its decision record
  * (reasons bitmask, keep flag) the moment it lands, instead of
  * waiting for the next batch audit over the accumulated corpus.
  *
  *   bit 0 (1)  fails the q21/q67 quality thresholds
  *              ([[Selection.qualityFail]] — the SAME column
  *              expression batch q79 evaluates)
  *   bit 1 (2)  exact normalized duplicate of an EARLIER-ARRIVED doc
  *              (q61's norm_md5; see arrival-order note below)
  *   bit 2 (4)  eval-shard contamination above q54's threshold,
  *              against a frozen [[EvalGramIndex]] ([[Dedup.gramsOf]]
  *              — the same tokenizer/gram joiner as batch
  *              `ngramEntries`)
  *   bit 3 (8)  IS the held-out eval shard (doc_id ≡ 3 mod 10)
  *
  * Bit 4 (semantic near-dup) is deliberately ABSENT: q70's verdict
  * requires clustering the full embedding corpus — a batch pass by
  * nature. The streaming audit covers the signals decidable per
  * document; the batch audit remains the full record.
  *
  * Shape: quality and the norm hash are codegen'd column expressions;
  * gram/contamination runs in ONE typed mapPartitions against the
  * broadcast [[EvalGramIndex]] (bloom fast-reject, exact md5-128
  * confirm — see the index's doc for why this, not a per-batch join).
  * The ONLY state in the stream is the exact-dup keeper table: one
  * `flatMapGroupsWithState` keyed on norm_md5 whose state is the
  * smallest doc_id seen — O(distinct contents) keys, 8 bytes each.
  *
  * Arrival-order contract (the streaming-vs-batch divergence, stated
  * rather than hidden): bit 1 marks a doc whose content arrived
  * earlier under a smaller doc_id. When arrival order follows doc_id
  * (replay/backfill — the convergence spec's setup), verdicts are
  * bit-identical to batch q79's `reasons & 15`. Under out-of-order
  * arrival, first-wins may keep a higher-id copy that batch would
  * drop — the same horizon batch re-audit over the accumulated corpus
  * closes, exactly as StreamingDedup defers to batch q32.
  */
object StreamingCurate {

  /** Freeze the eval shard's distinct word `DecontN`-grams into the
    * broadcast [[EvalGramIndex]]. Both tiers are built DISTRIBUTEDLY:
    * the bloom via treeAggregate, the digests via Spark-side
    * `unhex(md5(s))` — only 16-byte digests cross to the driver, never
    * gram strings. Driver memory is 16 B/gram + transient collect
    * overhead, bounding the freezable shard at ~an order of magnitude
    * beyond the previous `Set[String]` collect.
    */
  def frozenEvalIndex(evalDocs: DataFrame): Broadcast[EvalGramIndex] = {
    val s = evalDocs.sparkSession
    import s.implicits._
    val grams = Dedup.ngramEntries(evalDocs, Dedup.DecontN)
      .select(col("s")).distinct().persist()
    val n = math.max(grams.count(), 1L)
    val bloom = grams.stat.bloomFilter("s", n, 0.03)
    val pairs = grams.select(unhex(md5(col("s"))))
      .as[Array[Byte]].collect()
      .map { d =>
        val bb = java.nio.ByteBuffer.wrap(d)
        (bb.getLong(0), bb.getLong(8))
      }
    grams.unpersist()
    s.sparkContext.broadcast(EvalGramIndex.of(pairs, bloom))
  }

  /** Stateless leg over a streaming (or batch) `(doc_id, text)`
    * relation: quality + eval-shard bits as codegen'd expressions, the
    * contamination bit per-row against the frozen gram index, plus the
    * norm_md5 the stateful leg keys on. Eval-shard docs skip the
    * contamination check (batch q79 excludes them from `trg` — they
    * ARE the reference).
    */
  def signals(docs: DataFrame,
      evalIdx: Broadcast[EvalGramIndex]): Dataset[DocSignals] = {
    import docs.sparkSession.implicits._
    // coalesce null text to "": the ingest front door (DocIngest's
    // okCond) quarantines null-text rows before the pipeline, so this
    // is defense-in-depth against a bypassing producer — a null here
    // otherwise NPEs the typed deserializer (f_qual Int) and the gram
    // kernel, crash-looping the query on checkpoint replay (r07
    // review). "" yields a deterministic quality-fail verdict instead.
    docs.select(signalCols: _*)
      .as[(Long, String, Int, String)]
      .mapPartitions { it =>
        val ev = evalIdx.value
        it.map { case (id, text, fQual, norm) =>
          DocSignals(id, norm, baseBits(id, text, fQual, ev))
        }
      }
  }

  /** The ONE spelling of the per-document signal projection (null-text
    * defense + quality + norm digest) shared by [[signals]] and the
    * event-time audit — two hand-copies previously risked the two
    * audit surfaces silently forking on a defense/cast fix (r08
    * review).
    */
  private def signalCols: Seq[org.apache.spark.sql.Column] = Seq(
    col("doc_id").cast("long"),
    coalesce(col("text"), lit("")).as("text"),
    Selection.qualityFail(coalesce(col("text"), lit("")))
      .cast("int").as("f_qual"),
    Dedup.normMd5(coalesce(col("text"), lit("")))
      .as("norm_md5"))

  private def baseBits(id: Long, text: String, fQual: Int,
      ev: EvalGramIndex): Int = {
    val isEval = id % 10 == 3
    var base = fQual | (if (isEval) 8 else 0)
    if (!isEval) {
      val grams = Dedup.gramsOf(text, Dedup.DecontN)
      if (grams.nonEmpty) {
        var hits = 0
        grams.foreach(g => if (ev.contains(g)) hits += 1)
        if (hits.toDouble / grams.size > Dedup.DecontMax) base |= 4
      }
    }
    base
  }

  /** Streaming decontamination CUT — the stateless twin of batch q104:
    * every arriving TRAIN document is rewritten the moment it lands,
    * with all tokens covered by an eval-shard `DecontN`-gram removed
    * (batch q104 cuts the same cover via a broadcast join; here
    * membership is the frozen [[EvalGramIndex]] — bloom fast-reject +
    * exact md5-128 confirm, the repo's established content-identity
    * convention). NO state, NO watermark: the cut is a pure per-row
    * function of (document, frozen index), so the stream stays a
    * narrow mapPartitions — the [[StreamingProbe]] shape applied to a
    * rewrite instead of a probe. The single-doc cover and keep-loop
    * are `Dedup.contaminatedCuts`/`Dedup.cutText`, the EXACT code the
    * batch entry's rewrite runs — convergence is shared-kernel, not
    * reimplementation.
    */
  def cutContaminated(docs: DataFrame,
      evalIdx: Broadcast[EvalGramIndex]): Dataset[CutDoc] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ev = evalIdx.value
        it.map { case (id, text) =>
          val cuts = Dedup.contaminatedCuts(text, Dedup.DecontN, ev.contains)
          val (n, clean) = Dedup.cutText(text, cuts)
          CutDoc(id, n, clean)
        }
      }
  }

  /** The full streamed audit: stateless signals fused with the
    * exact-dup verdict in one stateful pass. State per norm_md5 is the
    * keeper (smallest doc_id seen); a replayed keeper re-emits `keep`
    * (idempotent under at-least-once sources). Within one micro-batch
    * a group resolves by min doc_id — batch q61's exact semantics.
    *
    * `stateTtl` (StreamingDedup's contract): on an unbounded stream,
    * NoTimeout pins one 8-byte keeper per distinct content forever;
    * with a TTL, a content key idle that long is evicted, bounding
    * state by the ACTIVE working set. The trade: a copy arriving
    * beyond the TTL after its keeper is flagged `keep` again — the
    * dedup horizon is the TTL, which batch re-audit over the
    * accumulated corpus closes.
    */
  def audit(docs: DataFrame,
      evalIdx: Broadcast[EvalGramIndex],
      stateTtl: Option[java.time.Duration] = None): Dataset[CurateVerdict] = {
    val sigs = signals(docs, evalIdx)
    import sigs.sparkSession.implicits._
    val timeoutKind = stateTtl.fold(GroupStateTimeout.NoTimeout())(_ =>
      GroupStateTimeout.ProcessingTimeTimeout())
    sigs.groupByKey(_.norm_md5)
      .flatMapGroupsWithState[Long, CurateVerdict](
        OutputMode.Append(), timeoutKind) {
        (_, chunk, state) =>
          if (state.hasTimedOut) {
            state.remove() // idle content key: evict, emit nothing
            Iterator.empty
          } else {
            val ds = chunk.toSeq.sortBy(_.doc_id)
            val keeper =
              math.min(state.getOption.getOrElse(Long.MaxValue),
                ds.head.doc_id)
            state.update(keeper)
            stateTtl.foreach(t => state.setTimeoutDuration(t.toMillis))
            ds.iterator.map { d =>
              val reasons = d.base | (if (d.doc_id != keeper) 2 else 0)
              CurateVerdict(d.doc_id, reasons, reasons == 0)
            }
          }
      }
  }

  /** EVENT-TIME variant of [[audit]]: the dedup horizon is a span of
    * STREAM time, not wall-clock — the curation analogue of the chain
    * engine's `MaxRollbackSlots` (reference
    * `CardanoIndexWorker.cs:63`): content is only held against
    * re-admission for `horizon` of EVENT time past its last sighting,
    * exactly as a chain point is only held for MaxRollbackSlots of
    * slots.
    *
    * Input must carry an `event_time` timestamp column. Semantics:
    *   - watermark = max event_time seen − `horizon`. Spark drops
    *     beyond-horizon stragglers (rows whose event_time is already
    *     below the watermark) BEFORE the stateful operator — they get
    *     NO verdict, the documented-and-tested beyond-horizon
    *     behavior (the batch re-audit over the accumulated corpus is
    *     their record, as ever).
    *   - a keeper evicts once the watermark passes `horizon` beyond
    *     its content's last-seen event time (EventTimeTimeout) — so
    *     state is bounded by the content DISTINCT within any
    *     `horizon`-wide window of stream time, a data-defined bound
    *     where [[audit]]'s processing-time TTL is a wall-clock one.
    *   - within the horizon, verdicts converge to batch q79 exactly
    *     as [[audit]]'s do (same keeper rule, same bits).
    */
  def auditEventTime(docs: DataFrame,
      evalIdx: Broadcast[EvalGramIndex],
      horizon: java.time.Duration): Dataset[CurateVerdict] = {
    import docs.sparkSession.implicits._
    // null-text defense as in signals(); and a NULL event_time (which
    // cast('timestamp') manufactures from any unparseable value) has
    // no event-time position — it is not late-filtered (null <
    // watermark is null) and would NPE the stateful pass, crash-looping
    // on checkpoint replay (r07 review). Dropping it is the
    // watermark-consistent semantic; the batch re-audit is its record.
    val sigs = docs.select(signalCols :+
        col("event_time").cast("timestamp").as("event_time"): _*)
      .filter(col("event_time").isNotNull)
      .as[(Long, String, Int, String, java.sql.Timestamp)]
      .mapPartitions { it =>
        val ev = evalIdx.value
        it.map { case (id, text, fQual, norm, et) =>
          TimedSignals(id, norm, baseBits(id, text, fQual, ev), et)
        }
      }
      .toDF()
      .withWatermark("event_time", s"${horizon.toMillis} milliseconds")
      .as[TimedSignals]
    sigs.groupByKey(_.norm_md5)
      .flatMapGroupsWithState[(Long, Long), CurateVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_, chunk, state) =>
          if (state.hasTimedOut) {
            state.remove() // horizon passed: content may be kept again
            Iterator.empty
          } else {
            val ds = chunk.toSeq.sortBy(_.doc_id)
            val (k0, et0) = state.getOption.getOrElse((Long.MaxValue, 0L))
            val keeper = math.min(k0, ds.head.doc_id)
            val lastEt = math.max(et0, ds.map(_.event_time.getTime).max)
            state.update((keeper, lastEt))
            // strictly past the current watermark, as the API requires
            // even when a straggler's lastEt already trails it
            state.setTimeoutTimestamp(
              math.max(lastEt, state.getCurrentWatermarkMs()) +
                math.max(horizon.toMillis, 1L))
            ds.iterator.map { d =>
              val reasons = d.base | (if (d.doc_id != keeper) 2 else 0)
              CurateVerdict(d.doc_id, reasons, reasons == 0)
            }
          }
      }
  }
}
