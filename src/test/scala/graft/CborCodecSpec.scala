package graft

import graft.core._
import graft.sources.{Blake2b, CborBlock, FileChainProvider}

/** Real-CBOR tier of the S6 decode contract (`ArgusUtil.cs:38-71`):
  * BLAKE2b-256 against published RFC 7693 vectors, synthesized-fixture
  * roundtrips over both CDDL output forms and the Conway tag-258 set,
  * wrap handling, buffer ownership, malformed rejection, the `.cbor`
  * directory path of FileChainProvider — and, when the reference's
  * 100-block real preview-network corpus is present on disk, a full
  * decode of every real block with slot-from-filename, height
  * monotonicity, and prev-hash chain linkage re-derived from raw bytes.
  */
class CborCodecSpec extends SparkSpec {

  private def hex64(i: Int): String = f"$i%064d" // digits are valid hex

  private def mkBlock(bi: Int, slot: Long, nTx: Int): Block = {
    val txs = (0 until nTx).map { ti =>
      Tx(hex64(bi * 100 + ti),
        inputs = (0 to ti % 2).map(k => TxInput(hex64(7000 + bi + k), k)),
        outputs = (0 to (ti + 1) % 3).map(k =>
          TxOutput(f"${bi}%02x${ti}%02x${k}%02x" * 10, 1000L + bi * 10 + k)))
    }
    Block(hash = "ignored", height = 500L + bi, slot = slot,
      transactions = txs, era = if (bi % 2 == 0) Era.Conway else Era.Babbage)
  }

  test("BLAKE2b matches the published RFC 7693 vectors") {
    def hexOf(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    // RFC 7693 appendix A: BLAKE2b-512("abc")
    assert(hexOf(Blake2b.hash("abc".getBytes("UTF-8"), 64)) ==
      "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1" +
        "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923")
    // widely published 256-bit vectors
    assert(Blake2b.hash256Hex("abc".getBytes("UTF-8")) ==
      "bddd813c634239723171ef3fee98579b94964e3bb1cb3e427262c8c068d52319")
    assert(Blake2b.hash256Hex(Array.emptyByteArray) ==
      "0e5751c026e543b2e8ab2eb06099daa1d1e5df47778f7787faab45cdf12fe3a8")
    // block-boundary regression: exactly 128 bytes must go through the
    // padded-last-block path, not an extra empty block
    val b128 = Blake2b.hash256Hex(Array.fill[Byte](128)(0x61))
    val b129 = Blake2b.hash256Hex(Array.fill[Byte](129)(0x61))
    assert(b128 != b129 && b128.length == 64)
  }

  test("synthesized-fixture roundtrip: era, header fields, inputs, both output forms, tag-258 sets") {
    for (bi <- 0 until 12; wrapped <- Seq(true, false)) {
      val (bytes, real) = CborBlock.encode(mkBlock(bi, 9000L + bi * 3, nTx = bi % 4), wrapped = wrapped)
      val got = CborBlock.decode(bytes)
      assert(got.contains((real.era, real)),
        s"block $bi wrapped=$wrapped:\n  got $got\n  want $real")
      assert(real.hash.length == 64 && real.hash.matches("[0-9a-f]+"))
      real.transactions.foreach(t => assert(t.txHash.length == 64))
    }
  }

  test("headerInfo exposes the prev-hash linkage accessor") {
    val (b1, r1) = CborBlock.encode(mkBlock(1, 100L, 1))
    val (b2, _) = CborBlock.encode(mkBlock(2, 105L, 2), prevHash = r1.hash)
    val h1 = CborBlock.headerInfo(b1).get
    val h2 = CborBlock.headerInfo(b2).get
    assert(h1.hash == r1.hash && h1.height == r1.height && h1.slot == 100L)
    assert(h2.prevHash == r1.hash, "prev-hash must chain")
  }

  test("buffer ownership: mutating the source buffer after decode leaves the block intact") {
    val (bytes, real) = CborBlock.encode(mkBlock(3, 777L, 3))
    val got = CborBlock.decode(bytes).get._2
    java.util.Arrays.fill(bytes, 0.toByte) // the reused network buffer
    assert(got == real, "decoded block must own its bytes")
  }

  test("malformed / unsupported input is rejected as None, never a throw") {
    val (bytes, _) = CborBlock.encode(mkBlock(4, 50L, 2))
    assert(CborBlock.decode(bytes.take(bytes.length / 2)).isEmpty)
    assert(CborBlock.decode(Array[Byte](0x42, 0x01, 0x02)).isEmpty)
    assert(CborBlock.decode(Array.emptyByteArray).isEmpty)
    // wrong tag: tag 42 instead of 24
    val w = new graft.sources.CborWriter
    w.tag(42); w.bytes(Array[Byte](1, 2, 3))
    assert(CborBlock.decode(w.result()).isEmpty)
    // under-arity input: a definite [tx_id] with no index must reject
    // (r14 review pass 20: skipItems(k-2) no-ops on negative, so the
    // reads would otherwise consume sibling items and misparse)
    val ua = new graft.sources.CborWriter
    ua.arrayHeader(2); ua.uint(4L)
    ua.arrayHeader(2)
    ua.arrayHeader(2) // header = [header_body, sig]
    ua.arrayHeader(3); ua.uint(7L); ua.uint(9L); ua.bytes(new Array[Byte](32))
    ua.bytes(new Array[Byte](64))
    ua.arrayHeader(1) // one tx body
    ua.mapHeader(1); ua.uint(0L)
    ua.tag(258); ua.arrayHeader(1)
    ua.arrayHeader(1); ua.bytes(new Array[Byte](32)) // [tx_id] — arity 1
    assert(CborBlock.decode(ua.result()).isEmpty)
    // Byron era index: structurally different, rejected + counted
    val before = CborBlock.unsupportedEraCount.sum()
    val byron = new graft.sources.CborWriter
    byron.arrayHeader(2); byron.uint(Era.Byron.toLong); byron.arrayHeader(0)
    assert(CborBlock.decode(byron.result()).isEmpty)
    assert(CborBlock.unsupportedEraCount.sum() == before + 1)
  }

  test("adversarial nesting: stacked tags/arrays fail bounded instead of overflowing the stack") {
    // r11 review: skipItem recursed once per nesting level, so 100k
    // stacked tag bytes (C6 C6 C6 …) or definite 1-element arrays
    // (81 81 81 …) threw StackOverflowError — an ERROR that escapes
    // decode's Exception fence and would kill the ingest task on one
    // crafted wire blob. The depth bound must turn both into CborError.
    def deep(b: Int): Array[Byte] =
      Array.fill(100000)(b.toByte) :+ 0x00.toByte // terminal uint 0
    Seq(0xc6, 0x81, 0x9f).foreach { b =>
      val r = new graft.sources.CborReader(deep(b))
      intercept[Exception] { r.skipItem() } // CborError, never an Error
    }
    // and through the decode fence: a block whose header item is the
    // nested bomb must come back None, not a crashed JVM
    val inner = new graft.sources.CborWriter
    inner.arrayHeader(2); inner.uint(Era.Conway.toLong)
    inner.arrayHeader(2)
    inner.raw(Array.fill(100000)(0xc6.toByte) :+ 0x00.toByte)
    inner.arrayHeader(0)
    assert(CborBlock.decode(inner.result()).isEmpty)
  }

  test("adversarial length vectors: overflow skips and the uint64 sentinel terminate as failures") {
    // r07 review regression vectors. (1) A byte-string head claiming
    // length 0x7FFFFFFFFFFFFFF7 inside an indefinite array: pos + arg
    // overflowed Long past the bounds check and arg.toInt (= -9) moved
    // pos BACKWARD onto the same head — an infinite skip loop on
    // crafted network bytes. Must now fail (None), and must RETURN.
    def arr(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray
    val bomb = new graft.sources.CborWriter
    bomb.tag(24)
    // the bomb must sit where skipItem actually walks: the HEADER item
    // that rawItem() skips. content = [era, [<header = 9f (indefinite
    // array) 5b <huge len> ...>, bodies...]] — the old code's
    // `while (!atBreak) skipItem()` re-read the same head forever
    val inner = new graft.sources.CborWriter
    inner.arrayHeader(2); inner.uint(Era.Conway.toLong)
    inner.arrayHeader(2) // block = [header, bodies]
    inner.raw(arr(0x9f, 0x5b, 0x7f, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xf7, 0xff))
    inner.arrayHeader(0) // bodies
    bomb.bytes(inner.result())
    val t0 = System.nanoTime()
    assert(CborBlock.decode(bomb.result()).isEmpty)
    assert((System.nanoTime() - t0) < 5L * 1000 * 1000 * 1000,
      "decode must terminate, not loop")
    // (2) an 8-byte uint argument >= 2^63 read as NEGATIVE and collided
    // with the indefinite-length sentinel, flipping a definite item to
    // indefinite parsing; the reader must reject it outright
    val r = new graft.sources.CborReader(
      arr(0x5b, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff))
    intercept[RuntimeException](r.readBytes())
  }

  test("FileChainProvider reads a .cbor directory, distributed-decoded and slot-ordered") {
    val dir = tmpDir("cbor-blocks")
    var prev = "00" * 32
    val reals = (0 until 10).map { bi =>
      val (bytes, real) = CborBlock.encode(
        mkBlock(bi, 2000L + bi * 5, nTx = 1 + bi % 3), prevHash = prev)
      prev = real.hash
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"${real.slot}.cbor"), bytes)
      real
    }
    // one undecodable straggler: skipped, not fatal (null-and-skip)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "junk.cbor"), Array[Byte](1, 2, 3))
    val p = new FileChainProvider(spark, dir)
    assert(p.tip.contains(Point(reals.last.hash, reals.last.slot)))
    val events = p.startChainSync(Seq.empty).toVector
    assert(events.head.isInstanceOf[RollBack])
    val blocks = events.collect { case RollForward(b) => b }
    assert(blocks == reals.toVector, "slot order + full field fidelity")
  }

  test("streaming ingest of a .cbor directory drives the full UTxO graph to the oracle balances") {
    val sp = spark
    import sp.implicits._
    // a spend-matched chain in REAL-HASH space (shared generator)
    val gen = graft.sources.CborChainGen.generate(16, seed = 11)
    val watched = graft.sources.CborChainGen.Watched
    val oracle = graft.sources.CborChainGen.balanceOracle(gen, watched)
    val dir = tmpDir("cbor-stream")
    def drop(bs: Seq[(Array[Byte], Block)]): Unit = bs.foreach { case (bytes, b) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"${b.slot}.cbor"), bytes)
    }
    drop(gen.take(10)); Thread.sleep(1100); drop(gen.drop(10))
    val reducers = Seq(
      new graft.operators.BlockSummaryReducer,
      new graft.operators.TxIndexReducer,
      new graft.operators.WalletUtxoReducer(watched),
      new graft.operators.BalanceSnapshotReducer(watched))
    val store = new graft.core.StateStore(tmpDir("cbor-stream-store"), sp)
    val runner = new graft.core.GraphRunner(sp, store, reducers, batchSize = 500)
    val q = graft.streaming.ChainIngest.start(sp, dir, tmpDir("cbor-stream-cp"),
      runner, trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(120000)
    val snaps = store.read("balance_snapshots", reducers(3).tables.head.schema)
      .collect().groupBy(_.getLong(3))
      .map { case (s, rs) => s -> rs.map(r => r.getString(1) -> r.getLong(4)).toMap }
    assert(snaps.size == oracle.size,
      s"${snaps.size} snapshot slots vs ${oracle.size} oracle slots")
    oracle.foreach { case (s, bal) =>
      assert(snaps(s) == bal, s"slot $s: ${snaps(s)} vs $bal")
    }
    // the real-hash spend matching was non-vacuous: some tx consumed an
    // earlier tx's BLAKE2b-identified output
    assert(gen.flatMap(_._2.transactions).exists(_.inputs.nonEmpty))
  }

  test("REAL reference corpus: 100 preview-network blocks decode with slot, height, and hash linkage") {
    val dir = new java.io.File(
      "/root/reference/src/Argus.Sync.Tests/TestData/Blocks")
    assume(dir.isDirectory, "reference corpus not on disk")
    val files = dir.listFiles.filter(_.getName.endsWith(".cbor")).sortBy(_.getName)
    assume(files.nonEmpty)
    val decoded = files.map { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val d = CborBlock.decode(bytes)
      assert(d.isDefined, s"failed to decode real block ${f.getName}")
      val (era, blk) = d.get
      assert(era == blk.era && era >= Era.Babbage && era <= Era.Conway)
      assert(blk.slot.toString == f.getName.stripSuffix(".cbor"),
        s"slot ${blk.slot} vs filename ${f.getName}")
      blk
    }.sortBy(_.slot)
    // heights are consecutive on this contiguous corpus slice
    decoded.sliding(2).foreach { case Array(a, b) =>
      assert(b.height == a.height + 1, s"${a.height} -> ${b.height}")
    }
    // THE strong check: BLAKE2b-256(header bytes) of block h must equal
    // the prev_hash field carried by block h+1 — validates the hash, the
    // header span slicing, and the field offsets all at once
    val headerOf = files.map { f =>
      CborBlock.headerInfo(java.nio.file.Files.readAllBytes(f.toPath)).get
    }.sortBy(_.slot)
    headerOf.sliding(2).foreach { case Array(a, b) =>
      assert(b.prevHash == a.hash,
        s"chain linkage broken at slot ${b.slot}")
    }
    // tx surface is non-vacuous: real txs with real lovelace decode
    val txs = decoded.flatMap(_.transactions)
    assert(txs.nonEmpty)
    assert(txs.exists(_.inputs.nonEmpty) && txs.exists(_.outputs.nonEmpty))
    val lovelace = txs.flatMap(_.outputs).map(_.lovelace)
    assert(lovelace.exists(_ > 1000000L),
      "real outputs should carry >1 ADA somewhere")
    assert(txs.flatMap(_.inputs).forall(_.txId.length == 64))
  }

  test("decoder fuzz: random bytes and bit-flipped real blocks never throw or hang") {
    val rnd = new scala.util.Random(13)
    // pure noise at assorted sizes
    (0 until 4000).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      CborBlock.decode(b) // Option either way; a throw/hang fails the test
      CborBlock.headerInfo(b)
    }
    // structured corruption: single bit flips in a VALID wire block -
    // the adversarial middle ground between noise and well-formed
    val (valid, _) = CborBlock.encode(mkBlock(7, 4242L, 3))
    (0 until 2000).foreach { _ =>
      val b = valid.clone()
      val bit = rnd.nextInt(b.length * 8)
      b(bit / 8) = (b(bit / 8) ^ (1 << (bit % 8))).toByte
      CborBlock.decode(b)
      CborBlock.headerInfo(b)
    }
    // truncations at every prefix length of the valid block
    (0 until valid.length).foreach(n => CborBlock.decode(valid.take(n)))
  }
}
