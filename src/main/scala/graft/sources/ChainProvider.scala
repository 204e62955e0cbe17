package graft.sources

import graft.core._
import org.apache.spark.sql.{Encoders, SparkSession}
import scala.jdk.CollectionConverters._

/** The chain-provider seam (SURVEY.md S1/S2/S4) — the reference's entire
  * source layer is one interface, `ICardanoChainProvider`
  * (`Providers/ICardanoChainProvider.cs:17`): start a chain-sync from a
  * set of candidate intersection points, yielding roll-forward/roll-back
  * events; plus a tip query (S5). Socket/TCP/gRPC implementations plug in
  * behind this trait; offline, the scripted mock and the file reader are
  * the two backends (the reference proves the seam the same way with
  * `MockChainSyncProvider`).
  */
trait ChainProvider {

  /** Start a chain-sync from the newest surviving candidate point.
    * Protocol-faithful contract (reference `N2CProvider.cs:47-106`):
    *  - candidates are tried NEWEST-FIRST; points no longer on the chain
    *    (rolled back) are skipped (`:58-74`);
    *  - if every candidate has been rolled back, fail hard (`:78-83`);
    *  - the stream OPENS with a RollBack to the agreed intersection
    *    (standard Ouroboros; `MockChainSyncProvider.cs:78-90` pins it) —
    *    this trims rows orphaned by a crash after their checkpoint;
    *  - then events follow in slot order.
    * An empty candidate list means "sync from origin".
    */
  def startChainSync(candidates: Seq[Point]): Iterator[BlockEvent]

  /** Current chain tip (S5; reference `GetTipAsync`). Used only for
    * progress reporting (§2.12), never for correctness.
    */
  def tip: Option[Point]
}

object ChainProvider {

  /** Pipeline depth as a stepwise function of the gap to the tip — the
    * pure function behind the reference's adaptive prefetch (S3,
    * `N2NProvider.cs:263-279`; unit-pinned by
    * `AdaptivePipelineDepthTest.cs:20-47`). At the tip the source
    * requests one block at a time (latency); far behind it batches up to
    * `maxDepth` (throughput). In the Spark engine this feeds
    * `maxFilesPerTrigger`-style rate control.
    */
  def adaptivePipelineDepth(maxDepth: Int, tipGap: Long): Int = {
    val target =
      if (tipGap <= 4L) 1
      else if (tipGap <= 20L) 2
      else if (tipGap <= 100L) 5
      else if (tipGap <= 500L) 20
      else if (tipGap <= 2000L) 100
      else if (tipGap <= 10000L) 500
      else if (tipGap <= 50000L) 2000
      else maxDepth
    math.min(maxDepth, math.max(1, target))
  }
}

/** Scripted in-memory provider — the reference's `MockChainSyncProvider`
  * re-expressed (`Mocks/MockChainSyncProvider.cs:29-139`): it knows the
  * canonical chain (for intersection negotiation and the tip query) and
  * replays a scripted event sequence after the protocol-faithful opening
  * rollback. Mid-stream reorgs are just scripted RollBack events.
  *
  * `chain`: the canonical blocks this node "has" (sorted by slot).
  * `script`: events yielded after the opening rollback; defaults to a
  * plain roll-forward of the whole chain.
  */
final class MockChainProvider(
    chain: Seq[Block],
    script: Option[Seq[BlockEvent]] = None) extends ChainProvider {

  require(chain.nonEmpty, "mock provider needs a non-empty chain")
  private val bySlot = chain.map(b => b.slot -> b.hash).toMap

  /** Connections opened — tests assert reconnect behavior. */
  var connections: Int = 0

  def startChainSync(candidates: Seq[Point]): Iterator[BlockEvent] = {
    connections += 1
    // Newest-first walk, dropping rolled-back points (N2CProvider.cs:58-74)
    val agreed = candidates.sortBy(-_.slot)
      .find(p => bySlot.get(p.slot).contains(p.hash))
    if (candidates.nonEmpty && agreed.isEmpty)
      throw new IllegalStateException(
        s"Failed to find any valid intersection point. All " +
          s"${candidates.size} saved intersection(s) have been rolled " +
          "back. Consider resetting the reducer state or increasing the " +
          "rollback buffer size.") // N2CProvider.cs:78-83
    val intersection = agreed.getOrElse(Point("origin", -1L))
    val tail = script.getOrElse(
      chain.filter(_.slot > intersection.slot).map(RollForward.apply))
    Iterator.single[BlockEvent](RollBack(intersection, Exclusive)) ++
      tail.iterator
  }

  def tip: Option[Point] =
    Some(Point(chain.last.hash, chain.last.slot))
}

/** File provider: the deterministic offline backend reading blocks from
  * a directory (the same files ChainIngest streams). Two on-disk forms
  * behind one seam:
  *   - parquet block rows (this engine's generated chains);
  *   - a directory of REAL Cardano `.cbor` blocks (the reference's
  *     `TestData/Blocks` corpus shape) — read via Spark's
  *     binaryFile source and decoded EXECUTOR-SIDE by [[CborBlock]],
  *     so a 100 TB block archive decodes distributed, not on the
  *     driver; undecodable files are skipped (the reference's
  *     null-and-skip `MockChainSyncProvider.DiscoverAllBlocks`).
  * Pull-based iteration through the common seam; the driver only ever
  * holds one partition's iterator worth of blocks (`toLocalIterator`).
  */
final class FileChainProvider(spark: SparkSession, blocksDir: String)
    extends ChainProvider {

  private lazy val hasCbor: Boolean = CborBlock.isCborDir(blocksDir)

  private def sorted = {
    import spark.implicits._
    if (hasCbor)
      spark.read.format("binaryFile").load(s"$blocksDir/*.cbor")
        .select("content").as[Array[Byte]]
        .flatMap(b => CborBlock.decode(b).map(_._2))
        .sort("slot")
    else
      spark.read.schema(Encoders.product[Block].schema).parquet(blocksDir)
        .as[Block].sort("slot")
  }

  def startChainSync(candidates: Seq[Point]): Iterator[BlockEvent] = {
    // The trait's negotiation contract holds here too: candidates are
    // validated (hash at slot) against the file corpus, rolled-back
    // points are skipped newest-first, and all-gone fails hard — a
    // checkpoint from a fork whose blocks were replaced in the corpus
    // must trigger a deeper intersection, not silent divergence. Only
    // the candidate slots' rows are collected (≤ window size).
    val agreed: Option[Point] =
      if (candidates.isEmpty) None
      else {
        val slots = candidates.map(_.slot).toSet
        val onChain = sorted.filter(b => slots.contains(b.slot))
          .collect().map(b => b.slot -> b.hash).toMap
        val found = candidates.sortBy(-_.slot)
          .find(p => onChain.get(p.slot).contains(p.hash))
        if (found.isEmpty)
          throw new IllegalStateException(
            s"Failed to find any valid intersection point. All " +
              s"${candidates.size} saved intersection(s) have been rolled " +
              "back.")
        found
      }
    val intersection = agreed.getOrElse(Point("origin", -1L))
    Iterator.single[BlockEvent](RollBack(intersection, Exclusive)) ++
      sorted.filter(_.slot > intersection.slot).toLocalIterator().asScala
        .map(RollForward.apply)
  }

  def tip: Option[Point] = {
    import spark.implicits._
    sorted.select("hash", "slot").as[(String, Long)]
      .orderBy(org.apache.spark.sql.functions.col("slot").desc)
      .limit(1).collect().headOption.map { case (h, s) => Point(h, s) }
  }
}

/** The worker loop connecting a provider to the runner — the §3.3 startup
  * flow of `CardanoIndexWorker`: candidates = the store's checkpoint
  * window filtered to the graph-safe minimum (T10), the provider's
  * opening rollback trims orphaned rows, then events stream through the
  * batch engine. Reconnect-after-crash is just calling this again.
  */
object ProviderSync {

  /** Safe intersection candidates: every stored point at or below the
    * min-across-graph latest slot (reference `StartPoints.cs:217-269`).
    */
  def safeCandidates(runner: GraphRunner): Seq[Point] = {
    val safe = runner.latestCheckpointSlot
    runner.store.checkpoints.values.flatten.toSeq
      .filter(_.slot <= safe)
      .sortBy(-_.slot).distinctBy(_.slot)
      .take(CheckpointWindow.DefaultMaxCount)
  }

  def run(runner: GraphRunner, provider: ChainProvider): Unit = {
    val events = provider.startChainSync(safeCandidates(runner))
    // engine-side failures (a reducer bug, a store write error) abandon
    // the stream OUTSIDE the provider's own pull loop — release the
    // bearer's socket if the iterator holds one (the other half of the
    // r06 socket-leak fix; a plain in-memory iterator is untouched)
    try runner.processEvents(events)
    finally events match {
      case c: AutoCloseable => c.close()
      case _ => ()
    }
  }
}
