package graft

import graft.core._
import graft.sources._

/** The S2 TCP bearer, end to end over a real loopback socket: CBOR-framed
  * chain-sync messages (the public CDDL's constructor indices and point
  * shape), newest-first intersection negotiation, protocol-driven opening
  * and mid-stream rollbacks, real-CBOR block decode, and — the piece that
  * makes it S2 rather than S1 — OBSERVED adaptive request pipelining:
  * the server records the high-water mark of in-flight RequestNexts, so
  * the depth window is proven on the wire, not assumed from the step
  * function. Finishes with ProviderSync driving the full UTxO reducer
  * graph from the socket to oracle balances.
  */
class TcpChainSyncSpec extends SparkSpec {

  private def genChain(n: Int, seed: Int)
      : (Seq[(Array[Byte], Block)], Map[String, String]) =
    (CborChainGen.generate(n, seed), CborChainGen.Watched)

  test("full origin sync over TCP: decode fidelity + adaptive pipelining observed on the wire") {
    val (chain, _) = genChain(600, seed = 3)
    val server = new ChainSyncServer(chain)
    try {
      val p = new TcpChainProvider("127.0.0.1", server.port, maxDepth = 20)
      assert(p.tip.contains(Point(chain.last._2.hash, chain.last._2.slot)))
      val events = p.startChainSync(Seq.empty).toVector
      events.head match {
        case RollBack(pt, mode) =>
          assert(pt.hash == "origin" && mode == Inclusive,
            "origin rollback must map Inclusive at slot 0 (ArgusUtil semantics)")
        case other => fail(s"stream must open with a rollback, got $other")
      }
      val blocks = events.collect { case RollForward(b) => b }
      assert(blocks == chain.map(_._2).toVector, "block fidelity over the wire")
      // 600 slots behind ⇒ the step function requests 20-deep; the
      // server saw that window actually outstanding on the socket
      assert(server.maxInflight >= 10,
        s"pipelining never happened: maxInflight=${server.maxInflight}")
    } finally server.close()
  }

  test("a malformed intersect reply fails loudly AND releases the connection") {
    // regression (r11 session-2 review): a reply that dies in
    // readFrame/CBOR decode throws BEFORE the reply match, and that
    // path used to leak the socket — the server observing prompt EOF
    // after the client's failure is the on-the-wire proof of closure
    import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
    import java.net.{InetAddress, ServerSocket}
    val srv = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    @volatile var sawEof = false
    val t = new Thread(() => {
      val s = srv.accept()
      val in = new DataInputStream(new BufferedInputStream(s.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(s.getOutputStream))
      val (reply, _) = HandshakeWire.negotiate(
        ChainSyncWire.readFrame(in), HandshakeWire.DefaultVersions,
        ChainSyncServer.DefaultMagic)
      ChainSyncWire.writeFrame(out, reply); out.flush()
      ChainSyncWire.readFrame(in) // the FindIntersect
      // reply with garbage: valid frame, undecodable CBOR point shape
      ChainSyncWire.writeFrame(out, Array[Byte](0x42, 0x00, 0x00))
      out.flush()
      // a closed client surfaces as EOF/reset on the next read
      try { in.readInt(); () }
      catch { case _: java.io.IOException => sawEof = true }
      s.close()
    })
    t.setDaemon(true); t.start()
    val provider = new TcpChainProvider("127.0.0.1", srv.getLocalPort)
    intercept[Exception] { provider.startChainSync(Seq.empty) }
    t.join(5000)
    assert(sawEof, "client socket was not released after the failed intersect")
    srv.close()
  }

  test("intersection negotiation: newest-first, rolled-back candidates skipped, all-gone fails hard") {
    val (chain, _) = genChain(40, seed = 4)
    val server = new ChainSyncServer(chain)
    try {
      val p = new TcpChainProvider("127.0.0.1", server.port)
      val good = chain(19)._2
      val fork = Point("ab" * 32, chain(30)._2.slot) // newer but not on chain
      val events = p.startChainSync(
        Seq(Point(good.hash, good.slot), fork)).toVector
      events.head match {
        case RollBack(pt, mode) =>
          assert(pt == Point(good.hash, good.slot) && mode == Exclusive,
            "must agree on the newest SURVIVING candidate, Exclusive")
        case other => fail(s"$other")
      }
      val blocks = events.collect { case RollForward(b) => b }
      assert(blocks == chain.map(_._2).filter(_.slot > good.slot).toVector)
      val ex = intercept[IllegalStateException] {
        new TcpChainProvider("127.0.0.1", server.port)
          .startChainSync(Seq(fork, Point("cd" * 32, 1L)))
      }
      assert(ex.getMessage.contains("rolled back"), ex.getMessage)
    } finally server.close()
  }

  test("mid-stream reorg: server-driven MsgRollBackward surfaces as an Exclusive RollBack event") {
    val (chain, _) = genChain(20, seed = 5)
    val (alt, _) = genChain(24, seed = 6)
    val back = chain(9)._2
    val script = chain.take(10).map { case (w, b) => ServeForward(w, b) } ++
      Seq(ServeBack(Point(back.hash, back.slot))) ++
      alt.drop(20).map { case (w, b) => ServeForward(w, b) }
    val server = new ChainSyncServer(chain, Some(script))
    try {
      val events = new TcpChainProvider("127.0.0.1", server.port)
        .startChainSync(Seq.empty).toVector
      val reorgIdx = events.indexWhere {
        case RollBack(pt, Exclusive) => pt.slot == back.slot
        case _ => false
      }
      assert(reorgIdx > 0, s"scripted reorg never surfaced: $events")
      val after = events.drop(reorgIdx + 1).collect { case RollForward(b) => b }
      assert(after == alt.drop(20).map(_._2).toVector)
    } finally server.close()
  }

  test("ProviderSync drives the UTxO graph from the socket to oracle balances") {
    val sp = spark
    val (chain, watched) = genChain(16, seed = 11)
    val oracle = CborChainGen.balanceOracle(chain, watched)
    val server = new ChainSyncServer(chain)
    try {
      val reducers = Seq(
        new graft.operators.BlockSummaryReducer,
        new graft.operators.TxIndexReducer,
        new graft.operators.WalletUtxoReducer(watched),
        new graft.operators.BalanceSnapshotReducer(watched))
      val store = new graft.core.StateStore(tmpDir("tcp-sync-store"), sp)
      val runner = new graft.core.GraphRunner(sp, store, reducers, batchSize = 500)
      ProviderSync.run(runner,
        new TcpChainProvider("127.0.0.1", server.port))
      val snaps = store.read("balance_snapshots", reducers(3).tables.head.schema)
        .collect().groupBy(_.getLong(3))
        .map { case (s, rs) => s -> rs.map(r => r.getString(1) -> r.getLong(4)).toMap }
      assert(snaps.size == oracle.size)
      oracle.foreach { case (s, bal) =>
        assert(snaps(s) == bal, s"slot $s: ${snaps(s)} vs $bal")
      }
    } finally server.close()
  }

  test("live tip: MsgAwaitReply is non-terminal — blocks appended after the tip keep flowing") {
    // generate(14) extends generate(10) exactly (sequential RNG), so the
    // appended blocks continue the chain with real prev-hash linkage
    val full = CborChainGen.generate(14, seed = 7)
    val (chain, ext) = full.splitAt(10)
    val server = new ChainSyncServer(chain, followable = true)
    try {
      val it = new TcpChainProvider("127.0.0.1", server.port,
        followTip = true).startChainSync(Seq.empty)
      // catch-up phase: opening rollback + the 10 scripted blocks
      val catchUp = (0 to 10).map(_ => it.next())
      assert(catchUp.head.isInstanceOf[RollBack])
      assert(catchUp.collect { case RollForward(b) => b } == chain.map(_._2))
      // live phase: the tip request was answered MsgAwaitReply (not
      // terminal); appending answers the SAME outstanding request
      ext.foreach { case (w, b) => server.append(w, b) }
      val live = (0 until 4).map(_ => it.next())
      assert(live.collect { case RollForward(b) => b } == ext.map(_._2),
        "appended blocks must flow through the awaited request")
      it.asInstanceOf[AutoCloseable].close()
    } finally server.close()
  }

  test("a batch (AvailableNow) client terminates cleanly against a FOLLOWABLE server") {
    // mixed mode (r08 review): the server awaits requests it cannot
    // answer, so the batch client must treat its FIRST AwaitReply as
    // terminal for the whole pipelined batch — waiting on the rest
    // would deadlock against the parked live path
    val chain = CborChainGen.generate(10, seed = 71)
    val server = new ChainSyncServer(chain, followable = true)
    try {
      val events = new TcpChainProvider("127.0.0.1", server.port)
        .startChainSync(Seq.empty).toVector // followTip = false
      assert(events.collect { case RollForward(b) => b } == chain.map(_._2))
    } finally server.close()
  }

  test("a follower connecting AFTER appends replays them: the advertised tip is always servable") {
    // r08 review: appends extend the canonical replay chain, not just
    // a live queue — a reconnecting client must not hang waiting for a
    // block the tip advertises but the replay omits
    val full = CborChainGen.generate(14, seed = 73)
    val (chain, ext) = full.splitAt(10)
    val server = new ChainSyncServer(chain, followable = true)
    try {
      ext.foreach { case (w, b) => server.append(w, b) }
      val events = new TcpChainProvider("127.0.0.1", server.port)
        .startChainSync(Seq.empty).toVector // batch client, full replay
      assert(events.collect { case RollForward(b) => b } == full.map(_._2),
        "appended blocks must be part of a later connection's replay")
    } finally server.close()
  }

  test("LIVE indexing end to end: the engine follows the tip to oracle balances while the chain grows") {
    // the deployment shape the reference runs 24/7: ProviderSync +
    // followTip never drains — blocks appended AFTER the worker caught
    // up flow through the awaited request, the micro-batch engine, and
    // the transactional store, and the balances keep converging to the
    // oracle at the moving tip
    val sp = spark
    val full = CborChainGen.generate(20, seed = 83)
    val (chain, ext) = full.splitAt(12)
    val watched = CborChainGen.Watched
    val oracle = CborChainGen.balanceOracle(full, watched)
    val server = new ChainSyncServer(chain, followable = true)
    try {
      val reducers = Seq(
        new graft.operators.BlockSummaryReducer,
        new graft.operators.TxIndexReducer,
        new graft.operators.WalletUtxoReducer(watched),
        new graft.operators.BalanceSnapshotReducer(watched))
      val store = new graft.core.StateStore(tmpDir("live-store"), sp)
      val runner = new graft.core.GraphRunner(sp, store, reducers,
        batchSize = 1) // commit per block: the live cadence
      @volatile var err: Throwable = null
      val worker = new Thread(() =>
        try ProviderSync.run(runner,
          new TcpChainProvider("127.0.0.1", server.port, followTip = true))
        catch { case t: Throwable => err = t }, "live-worker")
      worker.start()
      ext.foreach { case (w, b) => server.append(w, b) }
      val lastSlot = full.last._2.slot
      val want = oracle.toMap.apply(lastSlot)
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      var got: Map[String, Long] = Map.empty
      while (got != want && System.nanoTime() < deadline && err == null) {
        got = store.read("balance_snapshots",
            reducers(3).tables.head.schema)
          .filter(org.apache.spark.sql.functions.col("slot") === lastSlot)
          .collect()
          .map(r => r.getString(1) -> r.getLong(4)).toMap
        if (got != want) Thread.sleep(200)
      }
      if (err != null) throw err
      assert(got == want,
        s"live tip never converged: $got vs $want")
    } finally {
      server.close() // ends the follow stream; the worker thread is daemon-less but JVM exits tests fine
    }
  }
}
