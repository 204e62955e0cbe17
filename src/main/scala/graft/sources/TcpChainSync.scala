package graft.sources

import graft.core._
import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}

/** A real TCP bearer for the chain-sync seam — the part of the
  * reference's N2N source (`Providers/N2NProvider.cs:89-215`) that every
  * prior round had to leave as "environment-bound": there is no Cardano
  * node to dial offline, but there IS a loopback, so the protocol itself
  * — framing, intersection negotiation, server-driven rollbacks, and
  * genuine REQUEST PIPELINING with the adaptive depth window — runs over
  * an actual socket here and is spec-pinned end to end.
  *
  * Wire format (from the PUBLIC ouroboros-network chain-sync CDDL — the
  * message constructor indices and point shape are the spec's own;
  * framing is simplified to one 4-byte big-endian length prefix per CBOR
  * message in place of the full mux, which multiplexes many
  * mini-protocols this engine doesn't carry):
  *
  *   msgRequestNext      = [0]
  *   msgAwaitReply       = [1]
  *   msgRollForward      = [2, blockBytes, tip]   ; tag-24-wrapped CBOR
  *   msgRollBackward     = [3, point, tip]
  *   msgFindIntersect    = [4, [point+]]
  *   msgIntersectFound   = [5, point, tip]
  *   msgIntersectNotFound= [6, tip]
  *   point               = [] / [slot, hash-bytes] ; [] = origin
  *
  * Blocks ride as REAL CBOR ([[CborBlock]]); rollback points map to
  * engine events exactly as `ArgusUtil.RollBackwardResponse` does:
  * specific point ⇒ Exclusive (the point itself survives), origin ⇒
  * Inclusive at slot 0.
  */
object ChainSyncWire {
  val MsgRequestNext = 0L
  val MsgAwaitReply = 1L
  val MsgRollForward = 2L
  val MsgRollBackward = 3L
  val MsgFindIntersect = 4L
  val MsgIntersectFound = 5L
  val MsgIntersectNotFound = 6L

  def writeFrame(out: DataOutputStream, payload: Array[Byte]): Unit = {
    out.writeInt(payload.length)
    out.write(payload)
  }

  def readFrame(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    require(n >= 0 && n <= 64 * 1024 * 1024, s"frame length $n")
    val buf = new Array[Byte](n)
    in.readFully(buf)
    buf
  }

  def pointCbor(w: CborWriter, p: Option[Point]): Unit = p match {
    case None => w.arrayHeader(0) // origin
    case Some(pt) =>
      w.arrayHeader(2)
      w.uint(pt.slot)
      w.bytes(unhex(pt.hash))
  }

  def readPoint(r: CborReader): Option[Point] =
    r.readArrayHeader() match {
      case 0 => None
      case 2 =>
        val slot = r.readUInt()
        val hash = hex(r.readBytes())
        Some(Point(hash, slot))
      case n => throw new IllegalArgumentException(s"point arity $n")
    }

  // hashes on this wire are the CONTENT-DERIVED hex digests real CBOR
  // blocks carry (BLAKE2b-256); CborBlock's strict helpers are the one
  // implementation — a non-hex id has no place in the protocol and
  // fails loudly there
  private[sources] def hex(b: Array[Byte]): String = CborBlock.hex(b)
  private[sources] def unhex(s: String): Array[Byte] = CborBlock.unhex(s)
}

/** What the server replays after the negotiated intersection. */
sealed trait ServedEvent
final case class ServeForward(wire: Array[Byte], block: Block) extends ServedEvent
final case class ServeBack(point: Point) extends ServedEvent

/** Loopback chain-sync SERVER — the node side of the protocol, built for
  * the spec: it knows the canonical chain (intersection negotiation +
  * tip), replays a script (default: roll the whole chain forward), and
  * RECORDS the high-water mark of pipelined-but-unanswered RequestNexts
  * so the client's adaptive pipelining is observable, not assumed.
  *
  * Peer contract: while a follower is parked in MustReply (AwaitReply
  * sent, chain not yet grown), the server probes peer liveness with a
  * TCP urgent byte every ~2s. Clients MUST leave `SO_OOBINLINE` off
  * (the Java default) so the byte is discarded out of band; a peer
  * that enables it would see a stray 0x00 spliced into the frame
  * stream. `setKeepAlive` is not a substitute here — its probes start
  * only after hours of idleness on stock kernels, far beyond a test's
  * or an operator's patience for detecting a vanished follower.
  */
final class ChainSyncServer(
    chain: Seq[(Array[Byte], Block)],
    script: Option[Seq[ServedEvent]] = None,
    networkMagic: Long = ChainSyncServer.DefaultMagic,
    versions: Seq[Long] = HandshakeWire.DefaultVersions,
    followable: Boolean = false) {
  import ChainSyncWire._

  require(chain.nonEmpty, "server needs a non-empty chain")
  private val server =
    new ServerSocket(0, 4, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort

  @volatile var maxInflight: Int = 0
  @volatile var negotiatedVersion: Long = -1L // spec observability
  @volatile private var running = true

  private val bySlot =
    scala.collection.concurrent.TrieMap(
      chain.map { case (_, b) => b.slot -> b.hash }: _*)
  @volatile private var tipPt = Point(chain.last._2.hash, chain.last._2.slot)
  private def tipPoint = tipPt

  // the canonical chain, EXTENDED by append: a connection arriving
  // after an append replays the appended blocks too — the tip the
  // server advertises is always servable (r08 review)
  @volatile private var canonical = chain.toVector

  // live-tip feeds (non-terminal MsgAwaitReply), ONE QUEUE PER
  // CONNECTION: registered at FindIntersect under the server lock,
  // atomically with the replay snapshot — a block appended before the
  // snapshot is IN it, one appended after arrives on this connection's
  // own queue; every connection sees every block exactly once, and a
  // dead connection can neither steal nor lose another follower's
  // events (r08 review)
  private val followers = scala.collection.mutable.Buffer[
    java.util.concurrent.LinkedBlockingQueue[ServedEvent]]()

  /** Extend the canonical chain; followers at the tip are fed live. */
  def append(wire: Array[Byte], block: Block): Unit = synchronized {
    require(followable, "append on a non-followable server")
    canonical :+= ((wire, block))
    bySlot.put(block.slot, block.hash)
    tipPt = Point(block.hash, block.slot)
    followers.foreach(_.put(ServeForward(wire, block)))
  }

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), "chainsync-conn")
        t.setDaemon(true)
        t.start()
      } catch {
        // backoff on a persistent accept failure (e.g. fd exhaustion):
        // a tight retry loop would pin a core and starve the recovery
        case _: Exception => if (running) Thread.sleep(50)
      }
    }
  }, "chainsync-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = {
    running = false
    server.close()
  }

  private def handle(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    var events: Seq[ServedEvent] = Seq.empty
    var cursor = 0
    var pendingRollback: Option[Option[Point]] = None
    var pendingRequests = 0
    var firstBurst = true
    // this connection's live feed (see `followers`)
    val myLive = new java.util.concurrent.LinkedBlockingQueue[ServedEvent]()
    var registered = false

    def tipTo(w: CborWriter): Unit = pointCbor(w, Some(tipPoint))

    def serveEvent(w: CborWriter, ev: ServedEvent): Unit = ev match {
      case ServeForward(wire, _) =>
        w.arrayHeader(3); w.uint(MsgRollForward)
        w.bytes(wire); tipTo(w)
      case ServeBack(p) =>
        w.arrayHeader(3); w.uint(MsgRollBackward)
        pointCbor(w, Some(p)); tipTo(w)
    }

    def respondOne(): Unit = {
      val w = new CborWriter
      pendingRollback match {
        case Some(p) =>
          w.arrayHeader(3); w.uint(MsgRollBackward)
          pointCbor(w, p); tipTo(w)
          pendingRollback = None
        case None if cursor < events.size =>
          serveEvent(w, events(cursor))
          cursor += 1
        case None if followable =>
          // live tip: this request cannot be answered yet — AwaitReply
          // goes out NOW, and the SAME request's real reply follows when
          // the chain grows (the protocol's MustReply state; the
          // batch-terminal treatment below is the AvailableNow mode)
          w.arrayHeader(1); w.uint(MsgAwaitReply)
          writeFrame(out, w.result()); out.flush()
          var ev: ServedEvent = null
          var probeIn = 40
          while (ev == null && running && !sock.isClosed) {
            ev = myLive.poll(50, java.util.concurrent.TimeUnit.MILLISECONDS)
            // sock.isClosed only reflects LOCAL close — a disconnected
            // batch client would otherwise park this handler thread
            // forever. Probe peer liveness with a TCP urgent byte every
            // ~2s (40 × 50ms — r09 advice: 250ms was needlessly chatty
            // toward an idle-but-alive follower). ASSUMES the peer
            // leaves SO_OOBINLINE off (the Java default, and what every
            // client in this repo does) so the byte is discarded out of
            // band; a peer with OOBInline ON would see a stray 0x00
            // inline — documented at the server's public surface. A
            // write after the peer's FIN/RST throws within two probes.
            if (ev == null) {
              probeIn -= 1
              if (probeIn == 0) {
                probeIn = 40
                try sock.sendUrgentData(0)
                catch { case _: java.io.IOException =>
                  throw new EOFException("peer closed while awaiting") }
              }
            }
          }
          if (ev == null) throw new EOFException("closed while awaiting")
          val w2 = new CborWriter
          serveEvent(w2, ev)
          writeFrame(out, w2.result())
          return
        case None =>
          w.arrayHeader(1); w.uint(MsgAwaitReply)
      }
      writeFrame(out, w.result())
    }

    try {
      // handshake FIRST: chain-sync may not speak before version +
      // networkMagic agreement (every real peer enforces this)
      val proposal = readFrame(in)
      val (reply, agreedVersion) =
        try HandshakeWire.negotiate(proposal, versions, networkMagic)
        catch {
          case e: Exception =>
            (HandshakeWire.refuseDecodeError(versions.max,
              String.valueOf(e.getMessage)), None)
        }
      writeFrame(out, reply); out.flush()
      if (agreedVersion.isEmpty) return // refused: connection is over
      negotiatedVersion = agreedVersion.get

      var open = true
      while (open) {
        val frame = readFrame(in)
        val r = new CborReader(frame)
        r.readArrayHeader()
        r.readUInt() match {
          case MsgFindIntersect =>
            val n = r.readArrayHeader()
            val candidates = (0 until n).map(_ => readPoint(r))
            // newest-first validation against the canonical chain —
            // exactly the N2CProvider walk the mock provider pins
            val specific = candidates.flatten
            val agreed = specific.sortBy(-_.slot)
              .find(p => bySlot.get(p.slot).contains(p.hash))
            val hasOrigin = candidates.contains(None)
            val w = new CborWriter
            if (agreed.isDefined || hasOrigin) {
              w.arrayHeader(3); w.uint(MsgIntersectFound)
              pointCbor(w, agreed); tipTo(w)
              pendingRollback = Some(agreed)
              val from = agreed.map(_.slot).getOrElse(-1L)
              // snapshot + follower registration are ATOMIC vs append:
              // an appended block lands either in this snapshot or on
              // myLive, never both, never neither
              events = ChainSyncServer.this.synchronized {
                if (followable && !registered) {
                  followers += myLive
                  registered = true
                }
                script.getOrElse(
                  canonical.collect { case (wire, b) if b.slot > from =>
                    ServeForward(wire, b)
                  })
              }
              cursor = 0
            } else {
              w.arrayHeader(2); w.uint(MsgIntersectNotFound); tipTo(w)
            }
            writeFrame(out, w.result())
            out.flush()
          case MsgRequestNext =>
            // drain every request already on the wire before answering:
            // the pipelining high-water mark is the client's true
            // in-flight window
            pendingRequests += 1
            // the client's OPENING window goes out in one flush, but on
            // a loaded host loopback delivery can lag this read — settle
            // until available() stops growing (bounded ~100ms, once per
            // connection) so the spec's high-water observation is not a
            // timing race (ADVICE r06); later rounds keep the fast path
            if (firstBurst) {
              firstBurst = false
              var last = -1
              var stable = 0
              val deadline = System.nanoTime() + 100L * 1000 * 1000
              while (stable < 3 && System.nanoTime() < deadline) {
                val a = in.available()
                if (a == last) stable += 1 else { stable = 0; last = a }
                Thread.sleep(2)
              }
            }
            // drain only COMPLETE frames: a RequestNext is exactly 6
            // bytes (4-byte length + [0]), so >= 6 available means one
            // can be read without blocking mid-frame. On a chunking
            // bearer a split frame simply isn't drained this round, so
            // maxInflight is a LOWER bound of the client's window —
            // exact on loopback, where frames arrive atomically.
            while (in.available() >= 6) {
              val f2 = readFrame(in)
              val r2 = new CborReader(f2)
              r2.readArrayHeader()
              require(r2.readUInt() == MsgRequestNext)
              pendingRequests += 1
            }
            maxInflight = math.max(maxInflight, pendingRequests)
            while (pendingRequests > 0) {
              respondOne()
              pendingRequests -= 1
            }
            out.flush()
          case other =>
            throw new IllegalArgumentException(s"unexpected message $other")
        }
      }
    } catch {
      case _: EOFException | _: java.net.SocketException => () // client left
      case e: Exception => if (running) throw e
    } finally {
      ChainSyncServer.this.synchronized { followers -= myLive }
      sock.close()
    }
  }
}

object ChainSyncServer {
  /** Loopback networkMagic both sides default to — any value works as
    * long as initiator and responder agree; disagreement is the refuse
    * path the spec exercises.
    */
  val DefaultMagic = 42L
}

/** TCP chain-sync CLIENT behind the [[ChainProvider]] seam — the S2
  * pipelined source with the pieces the reference implements: newest-
  * first intersection via MsgFindIntersect (all-rolled-back fails with
  * the reference's error), the opening rollback from the protocol's own
  * MsgRollBackward, blocks decoded from REAL CBOR, and the ADAPTIVE
  * PIPELINE WINDOW live on the socket: the client keeps
  * `adaptivePipelineDepth(maxDepth, tipGap)` MsgRequestNexts in flight,
  * topping the window up as responses arrive — at the tip it degrades
  * to one-at-a-time (latency), far behind it batches (throughput),
  * exactly the reference's `N2NProvider` step function, and the spec
  * reads the server's observed high-water mark to prove it.
  */
final class TcpChainProvider(host: String, port: Int, maxDepth: Int = 20,
    networkMagic: Long = ChainSyncServer.DefaultMagic,
    proposeVersions: Seq[Long] = HandshakeWire.DefaultVersions,
    followTip: Boolean = false)
    extends ChainProvider {
  import ChainSyncWire._

  /** Version agreed on the most recent connection (spec observability). */
  @volatile var lastNegotiatedVersion: Long = -1L

  private def handshake(in: DataInputStream, out: DataOutputStream): Unit =
    lastNegotiatedVersion = HandshakeWire.clientHandshake(
      p => { writeFrame(out, p); out.flush() },
      () => readFrame(in), networkMagic, proposeVersions)

  def startChainSync(candidates: Seq[Point]): Iterator[BlockEvent] = {
    val sock = new Socket(InetAddress.getByName(host), port)
    sock.setTcpNoDelay(true)
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    try handshake(in, out)
    catch { case e: Throwable => sock.close(); throw e }

    // the whole intersect exchange closes the socket on ANY failure —
    // not just the decoded IntersectNotFound/unexpected-reply arms: a
    // reply frame that fails the length bound or CBOR decode throws
    // from readFrame/readPoint BEFORE reaching the match, and before
    // this guard that path leaked the connection (and the server's
    // handler thread) on every retry (r11 session-2 review)
    var tipSlot = 0L
    try {
      val w = new CborWriter
      w.arrayHeader(2); w.uint(MsgFindIntersect)
      if (candidates.isEmpty) { w.arrayHeader(1); pointCbor(w, None) }
      else {
        w.arrayHeader(candidates.size)
        candidates.sortBy(-_.slot).foreach(p => pointCbor(w, Some(p)))
      }
      writeFrame(out, w.result()); out.flush()
      val r0 = new CborReader(readFrame(in))
      r0.readArrayHeader()
      r0.readUInt() match {
        case MsgIntersectFound =>
          readPoint(r0) // the intersection; the opening MsgRollBackward re-delivers it
          tipSlot = readPoint(r0).map(_.slot).getOrElse(0L)
        case MsgIntersectNotFound =>
          throw new IllegalStateException(
            s"Failed to find any valid intersection point. All " +
              s"${candidates.size} saved intersection(s) have been rolled " +
              "back. Consider resetting the reducer state or increasing " +
              "the rollback buffer size.")
        case other =>
          throw new IllegalStateException(s"unexpected reply $other")
      }
    } catch { case e: Throwable => sock.close(); throw e }

    // AutoCloseable so an early-abandoning consumer can release the
    // socket (and the server's handler thread); pull() also closes on
    // ANY exception — an unexpected message or a frame-length failure
    // must not leak the connection (ADVICE r06)
    new Iterator[BlockEvent] with AutoCloseable {
      private var inflight = 0
      private var drained = false
      private var lastSlot = -1L
      private var nextEvent: Option[BlockEvent] = None

      def close(): Unit =
        try sock.close() catch { case _: Exception => () }

      private def topUp(): Unit = {
        val gap = math.max(tipSlot - lastSlot, 0L)
        val depth = ChainProvider.adaptivePipelineDepth(maxDepth, gap)
        var sent = false
        while (inflight < depth && !drained) {
          val rq = new CborWriter
          rq.arrayHeader(1); rq.uint(MsgRequestNext)
          writeFrame(out, rq.result())
          inflight += 1
          sent = true
        }
        if (sent) out.flush()
      }

      private def pull(): Unit = try {
        while (nextEvent.isEmpty && !(drained && inflight == 0)) {
          topUp()
          val r = new CborReader(readFrame(in))
          r.readArrayHeader()
          inflight -= 1
          r.readUInt() match {
            case MsgRollForward =>
              val wire = r.readBytes()
              tipSlot = readPoint(r).map(_.slot).getOrElse(tipSlot)
              CborBlock.decode(wire) match {
                case Some((_, b)) =>
                  lastSlot = b.slot
                  nextEvent = Some(RollForward(b))
                case None => () // undecodable: null-and-skip
              }
            case MsgRollBackward =>
              val p = readPoint(r)
              tipSlot = readPoint(r).map(_.slot).getOrElse(tipSlot)
              // ArgusUtil.RollBackwardResponse mapping: specific point ⇒
              // Exclusive; origin ⇒ Inclusive at slot 0
              nextEvent = Some(p match {
                case Some(pt) => lastSlot = pt.slot; RollBack(pt, Exclusive)
                case None => lastSlot = -1L; RollBack(Point("origin", 0L), Inclusive)
              })
            case MsgAwaitReply =>
              if (followTip)
                // live mode: the awaited request's REAL reply is still
                // owed (MustReply) — keep its slot in the window and
                // keep reading; the server answers when the tip grows
                inflight += 1
              else {
                // catch-up complete: AvailableNow semantics. The FIRST
                // await ends the whole batch — replies to the other
                // pipelined requests are abandoned with the socket
                // (a followable server answers them only as the chain
                // grows; waiting on them would deadlock a batch client)
                drained = true
                inflight = 0
              }
            case other =>
              throw new IllegalStateException(s"unexpected message $other")
          }
        }
        if (drained && inflight == 0 && nextEvent.isEmpty) sock.close()
      } catch { case e: Throwable => close(); throw e }

      def hasNext: Boolean = {
        pull()
        nextEvent.isDefined
      }

      def next(): BlockEvent = {
        pull()
        val e = nextEvent.getOrElse(throw new NoSuchElementException)
        nextEvent = None
        e
      }
    }
  }

  def tip: Option[Point] = {
    val sock = new Socket(InetAddress.getByName(host), port)
    try {
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
      handshake(in, out) // every connection negotiates first
      val w = new CborWriter
      w.arrayHeader(2); w.uint(MsgFindIntersect)
      w.arrayHeader(1); pointCbor(w, None)
      writeFrame(out, w.result()); out.flush()
      val r = new CborReader(readFrame(in))
      r.readArrayHeader()
      r.readUInt()
      readPoint(r) // intersection (origin)
      readPoint(r) // tip
    } finally sock.close()
  }
}
