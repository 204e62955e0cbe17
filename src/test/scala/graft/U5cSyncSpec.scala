package graft

import graft.core._
import graft.sources._

/** The S4 U5C bearer end to end over a real loopback socket: protobuf-
  * encoded FollowTip messages in gRPC frames, the opening Reset
  * acknowledgement, and — the piece that distinguishes U5C from
  * chain-sync — the Apply/Undo/Reset ACTION MAPPING observed on the
  * wire and checked against the reference's semantics
  * (`U5CProvider.cs:44-73`): Apply ⇒ RollForward, Undo ⇒ RollBack
  * INCLUSIVE at the undone block's own slot (the block itself is
  * destroyed), Reset ⇒ RollBack EXCLUSIVE at the reset ref (the ref
  * survives). Finishes with ProviderSync driving the full UTxO reducer
  * graph from the socket to oracle balances.
  */
class U5cSyncSpec extends SparkSpec {

  private def genChain(n: Int, seed: Int)
      : (Seq[(Array[Byte], Block)], Map[String, String]) =
    (CborChainGen.generate(n, seed), CborChainGen.Watched)

  test("origin follow: opening Reset maps Exclusive at origin, block fidelity over the wire") {
    val (chain, _) = genChain(50, seed = 21)
    val server = new U5cServer(chain)
    try {
      val events = new U5cProvider("127.0.0.1", server.port)
        .startChainSync(Seq.empty).toVector
      events.head match {
        case RollBack(pt, mode) =>
          assert(pt.hash == "origin" && pt.slot == 0L && mode == Exclusive,
            s"opening Reset must map Exclusive at origin, got $pt $mode")
        case other => fail(s"stream must open with the Reset rollback, got $other")
      }
      val blocks = events.collect { case RollForward(b) => b }
      assert(blocks == chain.map(_._2).toVector,
        "block fidelity through protobuf framing + CBOR decode")
    } finally server.close()
  }

  test("intersection: newest candidate forwarded, Reset acks it Exclusive; dead ref fails hard") {
    val (chain, _) = genChain(40, seed = 22)
    val server = new U5cServer(chain)
    try {
      val good = chain(19)._2
      val older = chain(5)._2
      val events = new U5cProvider("127.0.0.1", server.port)
        .startChainSync(Seq(Point(older.hash, older.slot),
          Point(good.hash, good.slot))).toVector
      events.head match {
        case RollBack(pt, mode) =>
          assert(pt == Point(good.hash, good.slot) && mode == Exclusive,
            "must follow from the NEWEST candidate (MaxBy slot), Exclusive")
        case other => fail(s"$other")
      }
      val blocks = events.collect { case RollForward(b) => b }
      assert(blocks == chain.map(_._2).filter(_.slot > good.slot).toVector)
      // a ref not on the chain: the server signals the gRPC error
      // status; the provider maps it onto the engine's all-rolled-back
      // failure (the trait's fail-hard contract)
      val fork = Point("ab" * 32, chain(30)._2.slot)
      val ex = intercept[IllegalStateException] {
        new U5cProvider("127.0.0.1", server.port)
          .startChainSync(Seq(fork)).toVector
      }
      assert(ex.getMessage.contains("rolled back"), ex.getMessage)
    } finally server.close()
  }

  test("Undo maps Inclusive at the undone block's slot; Reset maps Exclusive (the U5C triple)") {
    val (chain, _) = genChain(20, seed = 23)
    val (alt, _) = genChain(24, seed = 24)
    val undone = chain(9)
    val resetTo = chain(7)._2
    val script =
      chain.take(10).map { case (w, _) => U5cApply(w) } ++
        Seq(U5cUndo(undone._1), // server withdraws block 10
          U5cReset(Point(resetTo.hash, resetTo.slot))) ++
        alt.drop(20).map { case (w, _) => U5cApply(w) }
    val server = new U5cServer(chain, Some(script))
    try {
      val events = new U5cProvider("127.0.0.1", server.port)
        .startChainSync(Seq.empty).toVector
      val undoIdx = events.indexWhere {
        case RollBack(pt, Inclusive) => pt.slot == undone._2.slot
        case _ => false
      }
      assert(undoIdx > 0, s"Undo never surfaced Inclusive: $events")
      events(undoIdx) match {
        case RollBack(pt, Inclusive) =>
          assert(pt == Point(undone._2.hash, undone._2.slot),
            "Undo must carry the undone block's OWN point (its bytes " +
              "decode to the point — U5CProvider.cs:54-61)")
        case _ => ()
      }
      events(undoIdx + 1) match {
        case RollBack(pt, Exclusive) =>
          assert(pt == Point(resetTo.hash, resetTo.slot),
            "Reset must map Exclusive at the reset ref")
        case other => fail(s"expected the Reset rollback next, got $other")
      }
      val after = events.drop(undoIdx + 2).collect { case RollForward(b) => b }
      assert(after == alt.drop(20).map(_._2).toVector)
    } finally server.close()
  }

  test("ProviderSync drives the UTxO graph from the U5C socket to oracle balances") {
    val sp = spark
    val (chain, watched) = genChain(16, seed = 25)
    val oracle = CborChainGen.balanceOracle(chain, watched)
    val server = new U5cServer(chain)
    try {
      val reducers = Seq(
        new graft.operators.BlockSummaryReducer,
        new graft.operators.TxIndexReducer,
        new graft.operators.WalletUtxoReducer(watched),
        new graft.operators.BalanceSnapshotReducer(watched))
      val store = new graft.core.StateStore(tmpDir("u5c-sync-store"), sp)
      val runner = new graft.core.GraphRunner(sp, store, reducers, batchSize = 500)
      ProviderSync.run(runner,
        new U5cProvider("127.0.0.1", server.port))
      val snaps = store.read("balance_snapshots", reducers(3).tables.head.schema)
        .collect().groupBy(_.getLong(3))
        .map { case (s, rs) => s -> rs.map(r => r.getString(1) -> r.getLong(4)).toMap }
      assert(snaps.size == oracle.size)
      oracle.foreach { case (s, bal) =>
        assert(snaps(s) == bal, s"slot $s: ${snaps(s)} vs $bal")
      }
    } finally server.close()
  }

  test("protobuf wire round-trip: varint edges, unknown fields skipped") {
    import ProtoWire._
    // varint edge values round-trip (1-byte, boundary, max)
    Seq(0L, 1L, 127L, 128L, 300L, Int.MaxValue.toLong, Long.MaxValue)
      .foreach { v =>
        val r = new Reader(new Writer().uint64(1, v).result)
        assert(r.readTag() == ((1, 0)) && r.readVarint() == v, s"v=$v")
      }
    // a message with an UNKNOWN field before the known ones still
    // parses (protobuf's forward-compat rule — a newer server may add
    // fields; the reader must skip, not misparse)
    val ref = U5cWire.blockRef(graft.core.Point("ab" * 32, 42L)).result
    val withUnknown = new Writer().uint64(9, 7L).result ++ ref
    val p = U5cWire.readBlockRef(withUnknown)
    assert(p == graft.core.Point("ab" * 32, 42L))
  }

  test("protobuf reader survives arbitrary bytes: fail-loud or parse, never hang or over-read") {
    // the WireFuzzSpec discipline on the U5C decoders: every reader
    // either returns a value or throws the bounded-read failures —
    // no infinite loop (progress is guaranteed even on zero tags), no
    // reads past the buffer, no OutOfMemory from a hostile length
    // (readBytes fences length against the REMAINING buffer)
    val rnd = new scala.util.Random(4242)
    val decoders = Seq[Array[Byte] => Any](
      U5cWire.readBlockRef,
      U5cWire.readFollowTipRequest,
      b => U5cWire.readFollowTipResponse(b))
    (0 until 2000).foreach { i =>
      val n = rnd.nextInt(48)
      val buf = new Array[Byte](n)
      rnd.nextBytes(buf)
      decoders.foreach { dec =>
        try { dec(buf); () }
        catch {
          case _: IllegalArgumentException => () // require / no-action
          case e: Throwable =>
            fail(s"iteration $i leaked ${e.getClass.getSimpleName}: " +
              buf.map(b => f"$b%02x").mkString)
        }
      }
    }
    // and a crafted hostile length: a varint claiming 2 GiB of bytes in
    // a 16-byte buffer must fail the fence, not allocate
    import ProtoWire._
    val hostile = new Writer().tag(2, 2).varint(Int.MaxValue.toLong)
      .result ++ Array.fill[Byte](8)(0x41)
    intercept[IllegalArgumentException] {
      U5cWire.readBlockRef(hostile)
    }
  }
}
