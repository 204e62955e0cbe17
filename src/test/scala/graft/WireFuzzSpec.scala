package graft

import graft.sources._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException}
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial fuzz for the mux demuxer and the U5C protobuf reader —
  * CborCodecSpec's discipline (random noise, bit flips, every
  * truncation, evil length fields, cross-protocol interleave) applied
  * to the two wire parsers that previously had happy-path +
  * segmentation coverage only (r07 verdict #5). The contract under
  * attack is uniform: parse correctly, or fail LOUDLY with a bounded
  * exception — never hang, never spin, never absorb unbounded memory,
  * and never deliver a torn message as complete.
  */
class WireFuzzSpec extends AnyFunSuite {

  private def demuxOver(bytes: Array[Byte]) =
    new MuxDemux(new DataInputStream(new ByteArrayInputStream(bytes)))

  /** Pull messages for `proto` until the finite stream fails; loud
    * failures are the expected end state, a hang/OOM fails the suite.
    */
  private def drain(bytes: Array[Byte], proto: Int,
      cap: Int = 10000): Vector[Array[Byte]] = {
    val d = demuxOver(bytes)
    val got = Vector.newBuilder[Array[Byte]]
    var n = 0
    try {
      while (n < cap) { got += d.nextMessage(proto); n += 1 }
      fail(s"demux delivered $cap messages from ${bytes.length} bytes")
    } catch {
      case _: EOFException => () // clean truncation end
      case _: RuntimeException => () // loud parse failure (CborError etc.)
    }
    got.result()
  }

  private def validStream(msgs: Seq[(Int, Array[Byte])],
      maxSeg: Int = Mux.MaxSegment): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    msgs.foreach { case (p, m) =>
      Mux.writeMsg(out, p, responder = true, m, maxSeg)
    }
    out.flush()
    bos.toByteArray
  }

  private def csMsg(i: Int): Array[Byte] = {
    val w = new CborWriter
    w.arrayHeader(2); w.uint(i.toLong); w.bytes(Array.fill(i % 37)(i.toByte))
    w.result()
  }

  test("mux demux: pure noise streams never hang and fail loudly") {
    val rnd = new scala.util.Random(17)
    (0 until 2000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      drain(b, proto = rnd.nextInt(4))
    }
  }

  test("mux demux: bit flips in a valid multi-protocol stream never hang; at worst a loud failure") {
    val rnd = new scala.util.Random(19)
    val valid = validStream(
      (0 until 12).map(i => (if (i % 2 == 0) 2 else 3, csMsg(i))))
    (0 until 2000).foreach { _ =>
      val b = valid.clone()
      val bit = rnd.nextInt(b.length * 8)
      b(bit / 8) = (b(bit / 8) ^ (1 << (bit % 8))).toByte
      drain(b, 2); drain(b, 3)
    }
  }

  test("mux demux: every truncation yields a strict PREFIX of the true message sequence — never a torn message") {
    val msgs = (0 until 8).map(i => (2, csMsg(i)))
    val valid = validStream(msgs, maxSeg = 7) // multi-frame messages
    val expected = msgs.map(_._2)
    (0 until valid.length).foreach { n =>
      val got = drain(valid.take(n), 2)
      assert(got.size <= expected.size)
      got.zip(expected).foreach { case (g, e) =>
        assert(java.util.Arrays.equals(g, e),
          s"torn/corrupted message delivered at truncation $n")
      }
    }
  }

  test("mux demux: an item that never completes hits the reassembly cap, not OOM") {
    // one CBOR head declaring a 100 MB byte string, then junk frames
    // forever: completeItemLength stays None, the buffer grows, and the
    // 64 MB cap must fail loudly before memory does
    val head = Array[Byte](0x5a, 0x05, (0xf5).toByte, (0xe1).toByte, 0x00)
    val junk = new Array[Byte](0xffff)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    Mux.writeMsg(out, 2, responder = true, head)
    (0 until 1040).foreach(_ => // ~68 MB > the 64 MB cap
      Mux.writeMsg(out, 2, responder = true, junk))
    val ex = intercept[IllegalArgumentException] {
      demuxOver(bos.toByteArray).nextMessage(2)
    }
    assert(ex.getMessage.contains("reassembly buffer overflow"))
  }

  test("mux demux: adversarial 1-byte frames across 3 interleaved protocols reassemble exactly") {
    val m2 = csMsg(21); val m3 = csMsg(33); val m5 = csMsg(45)
    // hand-interleave: frame k of each message round-robins on the wire
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val cursors = Array(0, 0, 0)
    val all = Array((2, m2), (3, m3), (5, m5))
    var progress = true
    while (progress) {
      progress = false
      all.zipWithIndex.foreach { case ((p, m), i) =>
        if (cursors(i) < m.length) {
          out.writeInt(0); out.writeShort(p | Mux.ResponderBit)
          out.writeShort(1); out.write(m, cursors(i), 1)
          cursors(i) += 1
          progress = true
        }
      }
    }
    out.flush()
    val d = demuxOver(bos.toByteArray)
    assert(java.util.Arrays.equals(d.nextMessage(3), m3))
    assert(java.util.Arrays.equals(d.nextMessage(5), m5))
    assert(java.util.Arrays.equals(d.nextMessage(2), m2))
  }

  test("mux frame reader: an evil declared length beyond the stream fails as truncation") {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(0); out.writeShort(2); out.writeShort(0xffff)
    out.write(Array[Byte](1, 2, 3)) // far fewer than declared
    intercept[EOFException] {
      Mux.readFrame(new DataInputStream(
        new ByteArrayInputStream(bos.toByteArray)))
    }
  }

  // ------------------------------------------------------------- U5C

  private def parseAll(b: Array[Byte]): Unit = {
    def swallow(f: => Any): Unit =
      try { f; () } catch { case _: RuntimeException => () }
    swallow(U5cWire.readFollowTipRequest(b))
    swallow(U5cWire.readFollowTipResponse(b))
    swallow(U5cWire.readBlockRef(b))
  }

  test("u5c protobuf: pure noise never hangs; parse or loud failure") {
    val rnd = new scala.util.Random(23)
    (0 until 4000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      parseAll(b)
    }
  }

  test("u5c protobuf: bit flips in valid messages never hang or mis-terminate") {
    val rnd = new scala.util.Random(29)
    val chain = CborChainGen.generate(3, seed = 31)
    val valid = Seq(
      U5cWire.followTipRequest(Seq(graft.core.Point("ab" * 32, 123L),
        graft.core.Point("origin", 0L))),
      U5cWire.applyResponse(chain.head._1),
      U5cWire.undoResponse(chain(1)._1),
      U5cWire.resetResponse(graft.core.Point("cd" * 32, 99L)))
    valid.foreach { v =>
      (0 until 1500).foreach { _ =>
        val b = v.clone()
        val bit = rnd.nextInt(b.length * 8)
        b(bit / 8) = (b(bit / 8) ^ (1 << (bit % 8))).toByte
        parseAll(b)
      }
    }
  }

  test("u5c protobuf: every truncation of a valid response parses or fails loudly") {
    val chain = CborChainGen.generate(2, seed = 37)
    val v = U5cWire.applyResponse(chain.head._1)
    (0 until v.length).foreach(n => parseAll(v.take(n)))
  }

  test("u5c protobuf: evil varints — 10-byte lengths, negative lengths, truncated varints — fail loudly") {
    // length-delimited field declaring a huge/negative length
    def field1WithLen(lenBytes: Array[Byte]): Array[Byte] =
      Array[Byte](0x0a) ++ lenBytes // tag field=1 wire=2
    val evil = Seq(
      field1WithLen(Array.fill(10)(0xff.toByte)), // maximal varint
      field1WithLen(Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte,
        0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte,
        0xff.toByte, 0x01)), // = -1 as uint64
      field1WithLen(Array[Byte](0x80.toByte)), // truncated varint
      Array[Byte](0x0b), // wire type 3 (group): unsupported, loud
      Array[Byte](0x0d), // wire type 5 with no payload
      Array[Byte](0x09)) // wire type 1 with no payload
    evil.foreach { b =>
      intercept[RuntimeException](U5cWire.readFollowTipRequest(b))
      ()
    }
  }

  test("u5c gRPC frame: evil declared lengths are rejected or fail as truncation") {
    // over-cap declared length → loud require
    val big = new ByteArrayOutputStream()
    val out = new DataOutputStream(big)
    out.writeByte(0); out.writeInt(Int.MaxValue)
    intercept[IllegalArgumentException] {
      U5cWire.readFrame(new DataInputStream(
        new ByteArrayInputStream(big.toByteArray)))
    }
    // in-cap declared length beyond the stream → truncation
    val short = new ByteArrayOutputStream()
    val out2 = new DataOutputStream(short)
    out2.writeByte(0); out2.writeInt(1000); out2.write(Array[Byte](1, 2))
    intercept[EOFException] {
      U5cWire.readFrame(new DataInputStream(
        new ByteArrayInputStream(short.toByteArray)))
    }
  }
}
