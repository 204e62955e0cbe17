package graft.sources

import graft.core._
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Binary block ingestion (SURVEY.md S6) — the analogue of the
  * reference's `ArgusUtil.DeserializeBlockWithEra`
  * (`Utils/ArgusUtil.cs:38-71`): peel an optional tag-24-style envelope,
  * decode `[era, block]`, and make a DEFENSIVE COPY of everything taken
  * from the input buffer — downstream consumers hold blocks long after
  * the network/source buffer is reused (contract pinned by the
  * reference's `BufferOwnershipTest.cs:25` and by BlockCodecSpec here).
  *
  * The wire format is this project's own deterministic envelope (no CBOR
  * library exists offline); the *shape* mirrors the reference: optional
  * 2-byte tag `0xD8 0x18` + length, then era byte, then the block body
  * with length-prefixed strings and counted sequences.
  */
object BlockCodec {

  val TagByte0: Byte = 0xD8.toByte
  val TagByte1: Byte = 0x18.toByte

  // ---- encode (test/generator side) ----

  /** `era = -1` (default) encodes `block.era`; an explicit value lets
    * tests forge out-of-range wire bytes.
    */
  def encode(block: Block, era: Int = -1, wrapped: Boolean = false): Array[Byte] = {
    val body = encodeBody(block, if (era < 0) block.era else era)
    if (!wrapped) body
    else {
      val bb = ByteBuffer.allocate(2 + 4 + body.length)
      bb.put(TagByte0).put(TagByte1).putInt(body.length).put(body)
      bb.array()
    }
  }

  private def putStr(bb: ByteBuffer, b: Array[Byte]): Unit =
    bb.putShort(b.length.toShort).put(b)

  private def encodeBody(b: Block, era: Int): Array[Byte] = {
    // every string is UTF-8-encoded ONCE and the byte array reused for
    // both the size precomputation and the write (r08 review: the
    // strLen/putStr pair encoded each twice, doubling encode-side
    // allocation on the generator/perf paths)
    def enc(s: String): Array[Byte] = {
      val a = s.getBytes(StandardCharsets.UTF_8)
      require(a.length <= Short.MaxValue,
        s"string field exceeds ${Short.MaxValue} bytes") // hashes/addresses
      a
    }
    val hash = enc(b.hash)
    val txs = b.transactions.map(t => (enc(t.txHash),
      t.inputs.map(i => (enc(i.txId), i.index)),
      t.outputs.map(o => (enc(o.address), o.lovelace))))
    val size = 1 + (2 + hash.length) + 8 + 8 + 4 +
      txs.map { case (th, ins, outs) => (2 + th.length) + 4 +
        ins.map(2 + _._1.length + 4).sum + 4 +
        outs.map(2 + _._1.length + 8).sum
      }.sum
    val bb = ByteBuffer.allocate(size)
    bb.put(era.toByte)
    putStr(bb, hash)
    bb.putLong(b.height).putLong(b.slot)
    bb.putInt(txs.size)
    txs.foreach { case (th, ins, outs) =>
      putStr(bb, th)
      bb.putInt(ins.size)
      ins.foreach { case (id, ix) => putStr(bb, id); bb.putInt(ix) }
      bb.putInt(outs.size)
      outs.foreach { case (ad, lv) => putStr(bb, ad); bb.putLong(lv) }
    }
    bb.array()
  }

  // ---- decode (ingestion side) ----

  /** Blocks decoded with an era byte past the known enum — a per-JVM
    * diagnostic (per-executor on a cluster): nonzero after a hard fork
    * the codec doesn't know yet, while ingestion keeps flowing.
    */
  val unknownEraCount = new java.util.concurrent.atomic.LongAdder

  /** `None` on malformed input (the reference returns null and the
    * caller skips — `MockChainSyncProvider.DiscoverAllBlocks`).
    * All strings are decoded via `new String(copy)` — bytes never alias
    * the caller's buffer (the S6 defensive-copy contract).
    */
  def decode(bytes: Array[Byte]): Option[(Int, Block)] =
    try {
      val bb = ByteBuffer.wrap(bytes)
      // optional tag-24-style wrap. Sniffing is ambiguous in one
      // corner: an UNWRAPPED body with era byte 0xD8 whose hash-length
      // short happens to have high byte 0x18 also matches the marker
      // (r07 review) — so a failed wrap-length check FALLS BACK to the
      // unwrapped parse instead of rejecting a block the encoder can
      // legitimately produce.
      if (bytes.length >= 6 && bytes(0) == TagByte0 && bytes(1) == TagByte1) {
        bb.position(2)
        val len = bb.getInt
        if (len != bb.remaining()) bb.position(0) // not a wrap after all
      }
      val era = bb.get().toInt & 0xFF
      // era pass-through (`Era.cs:6-24`): the reference's `(Era)value`
      // cast accepts ANY byte, so a post-Conway hard fork keeps
      // indexing there — dropping unknown eras here would silently
      // stall ingestion at the fork. Unknown eras decode normally
      // (structural checks below still catch garbage) and are COUNTED
      // so operators can see the fork in telemetry.
      val hash = getStr(bb)
      val height = bb.getLong
      val slot = bb.getLong
      val nTx = bb.getInt
      if (nTx < 0 || nTx > 1000000) return None
      val txs = (0 until nTx).map { _ =>
        val txHash = getStr(bb)
        // negative inner counts must REJECT like nTx does: `0 until -1`
        // is silently empty, so a corrupt count would decode as a valid
        // block with zero entries instead of None (r07 review)
        val nIn = bb.getInt
        if (nIn < 0 || nIn > 1000000) throw new IllegalArgumentException
        val ins = (0 until nIn).map(_ => TxInput(getStr(bb), bb.getInt))
        val nOut = bb.getInt
        if (nOut < 0 || nOut > 1000000) throw new IllegalArgumentException
        val outs = (0 until nOut).map(_ => TxOutput(getStr(bb), bb.getLong))
        Tx(txHash, ins, outs)
      }
      if (bb.hasRemaining) None
      else {
        // counted only AFTER the structural checks pass (r08 review):
        // garbage whose first byte happens to be outside 1..7 is data
        // corruption, not a hard-fork signal — inflating the fork
        // telemetry with it hides real anomalies behind noise
        if (!Era.isKnown(era)) unknownEraCount.increment()
        Some((era, Block(hash, height, slot, txs, era)))
      }
    } catch { case _: Exception => None }

  private def getStr(bb: ByteBuffer): String = {
    val len = bb.getShort.toInt
    require(len >= 0 && len <= bb.remaining())
    val copy = new Array[Byte](len) // defensive copy — never alias input
    bb.get(copy)
    new String(copy, StandardCharsets.UTF_8)
  }

  /** Distributed ingestion: a DataFrame with a `raw: binary` column →
    * typed blocks. `mapPartitions` is the right tool here (per-row
    * imperative parsing, SURVEY §7.4) — the one place the engine drops
    * below DataFrame ops. Malformed payloads are skipped, as in the
    * reference's corpus loader.
    */
  def decodeBlocks(raw: DataFrame, column: String = "raw"): Dataset[Block] = {
    implicit val enc = Encoders.product[Block]
    raw.select(column).as(Encoders.BINARY)
      .mapPartitions(_.flatMap(bytes => decode(bytes).map(_._2)))
  }

  /** JSON-lines ingestion — the schema-on-read twin of the binary
    * envelope, entirely in Catalyst (`from_json` against the canonical
    * block StructType; codegen'd, no mapPartitions). Malformed lines
    * parse to null and are skipped, same contract as `decodeBlocks`.
    */
  def decodeJsonBlocks(raw: DataFrame, column: String = "json"): Dataset[Block] = {
    import org.apache.spark.sql.functions.{coalesce, col, from_json, lit}
    implicit val enc = Encoders.product[Block]
    raw.select(from_json(col(column), enc.schema).as("b"))
      // height/slot/transactions must be present too: Block's primitive
      // fields make the typed deserializer THROW on a null (killing the
      // job on one incomplete line — the FAILFAST failure mode this
      // path exists to avoid), and a null transactions Seq NPEs
      // downstream (r07 review)
      .filter(col("b").isNotNull && col("b.hash").isNotNull &&
        col("b.height").isNotNull && col("b.slot").isNotNull &&
        col("b.transactions").isNotNull)
      // ... and NESTED nulls (r08 review): Tx/TxInput/TxOutput carry
      // primitive fields too, so a null txHash/index/lovelace inside a
      // parsed line throws in the typed deserializer exactly like a
      // top-level null — the skip contract must cover the whole tree
      .filter(!org.apache.spark.sql.functions.exists(col("b.transactions"),
        t => t.getField("txHash").isNull ||
          t.getField("inputs").isNull || t.getField("outputs").isNull ||
          org.apache.spark.sql.functions.exists(t.getField("inputs"),
            i => i.getField("txId").isNull || i.getField("index").isNull) ||
          org.apache.spark.sql.functions.exists(t.getField("outputs"),
            o => o.getField("address").isNull ||
              o.getField("lovelace").isNull)))
      .select(col("b.hash"), col("b.height"), col("b.slot"),
        col("b.transactions"),
        // era optional in JSON (pre-era producers) → Babbage; unknown
        // values pass through like the binary twin (fork-safe)
        coalesce(col("b.era"), lit(Era.Babbage)).as("era"))
      .as[Block]
  }
}
