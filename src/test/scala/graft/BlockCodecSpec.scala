package graft

import graft.core._
import graft.sources.{BlockCodec, ChainGen}

/** S6 binary decode contract: roundtrip over the seeded corpus, tag-24
  * style envelope handling, malformed-input skip, and the defensive-copy
  * contract (a reused source buffer must not corrupt decoded blocks) —
  * the reference's `BufferOwnershipTest.cs:25` in shape.
  */
class BlockCodecSpec extends SparkSpec {

  test("encode/decode roundtrip, bare and tag-wrapped, preserves every field incl. era") {
    val blocks = ChainGen.generate(30, seed = 21L)
    blocks.foreach { b =>
      assert(BlockCodec.decode(BlockCodec.encode(b)).contains((b.era, b)))
      val allegra = b.copy(era = Era.Allegra)
      assert(BlockCodec.decode(
        BlockCodec.encode(allegra, wrapped = true)).contains((Era.Allegra, allegra)))
    }
  }

  test("era pass-through: a byte past Conway keeps decoding (fork-safe, like the reference's enum cast) and is counted") {
    val b = ChainGen.generate(1, seed = 5L).head
    assert(BlockCodec.decode(BlockCodec.encode(b, era = Era.Max)).isDefined)
    val before = BlockCodec.unknownEraCount.sum()
    // a post-Conway hard-fork byte must NOT stall ingestion: the block
    // decodes with its era preserved and the skip counter ticks
    val next = Era.Max + 1
    assert(BlockCodec.decode(BlockCodec.encode(b, era = next))
      .contains((next, b.copy(era = next))))
    assert(BlockCodec.decode(BlockCodec.encode(b, era = 200))
      .contains((200, b.copy(era = 200))))
    assert(BlockCodec.unknownEraCount.sum() == before + 2)
    assert(BlockCodec.decode(BlockCodec.encode(b, era = Era.Unknown))
      .contains((Era.Unknown, b.copy(era = Era.Unknown))))
  }

  test("malformed payloads decode to None (loader skips, as in the reference corpus loader)") {
    assert(BlockCodec.decode(Array[Byte]()).isEmpty)
    assert(BlockCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    val good = BlockCodec.encode(ChainGen.generate(1, seed = 1L).head)
    assert(BlockCodec.decode(good.dropRight(1)).isEmpty, "truncated")
    assert(BlockCodec.decode(good :+ 0.toByte).isEmpty, "trailing garbage")
  }

  test("defensive copy: reusing the source buffer does not corrupt the decoded block (S6)") {
    val b = ChainGen.generate(1, seed = 2L).head
    val buf = BlockCodec.encode(b)
    val decoded = BlockCodec.decode(buf).get._2
    java.util.Arrays.fill(buf, 0.toByte) // source buffer reused
    assert(decoded == b, "decoded block must not alias the input buffer")
  }

  test("JSON-lines ingestion roundtrips through from_json; malformed lines skipped") {
    val sp = spark
    import sp.implicits._
    val blocks = ChainGen.generate(15, seed = 17L)
    val eraLess = // pre-era producer: era defaults to Babbage
      """{"hash":"aa","height":1,"slot":9999,"transactions":[]}"""
    val futureEra = // post-Conway era: passes through like the binary twin
      """{"hash":"bb","height":2,"slot":9998,"transactions":[],"era":99}"""
    val json = sp.createDataset(blocks).toJSON.collect().toSeq :+
      "{not json" :+ """{"other":"shape"}""" :+ eraLess :+ futureEra
    val decoded = graft.sources.BlockCodec.decodeJsonBlocks(
      sp.createDataset(json).toDF("json"))
    val expected = blocks :+ Block("bb", 2L, 9998L, Seq.empty, 99) :+
      Block("aa", 1L, 9999L, Seq.empty, Era.Babbage)
    assert(decoded.collect().toSeq.sortBy(_.slot) == expected.sortBy(_.slot))
  }

  test("distributed decode: binary column -> typed blocks via mapPartitions, engine-consumable") {
    val sp = spark
    import sp.implicits._
    val blocks = ChainGen.generate(20, seed = 13L)
    val raw = blocks.map(b => BlockCodec.encode(b, era = 6,
        wrapped = b.slot % 2 == 0)) :+ Array[Byte](9, 9) // one bad payload
    val df = sp.createDataset(raw).toDF("raw")
    val decoded = BlockCodec.decodeBlocks(df)
    assert(decoded.count() == blocks.size, "bad payload skipped")
    // decoded stream drives the engine exactly like any other source
    val store = new StateStore(tmpDir("codec-store"), spark)
    val runner = new GraphRunner(spark, store, Seq(
      new graft.operators.BlockSummaryReducer), batchSize = 100)
    runner.flush(decoded.toDF())
    assert(store.read("blocks",
      new graft.operators.BlockSummaryReducer().tables.head.schema).count()
      == blocks.size)
  }
}
