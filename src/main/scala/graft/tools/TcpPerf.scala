package graft.tools

import graft.core._
import graft.sources._

/** Measure the TCP chain-sync bearer's decode-only ceiling — the
  * analogue of the reference's ~1,900 blk/s "NoOp sink" number
  * (`unified-branch-batch-commit.md:38-40`): blocks pulled through the
  * loopback socket with adaptive pipelining and REAL-CBOR decode, no
  * engine behind it. Usage: `runMain graft.tools.TcpPerf [nBlocks] [reps]`.
  */
object TcpPerf {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(4000)
    val reps = if (args.length > 1) args(1).toInt else 3
    // spend-matched real-hash CBOR chain, the TcpChainSyncSpec generator
    val rnd = new scala.util.Random(9)
    val addrs = (0 until 6).map(i => f"aa$i%02d" * 8)
    val live = scala.collection.mutable.ArrayBuffer[(String, Int, String, Long)]()
    var prev = "00" * 32
    var height = 100L
    var slot = 1000L
    val chain = (0 until n).map { _ =>
      slot += 1 + rnd.nextInt(3)
      height += 1
      val txs = (0 until rnd.nextInt(3)).map { _ =>
        val nSpend = rnd.nextInt(3).min(live.size)
        val spends = (0 until nSpend).map(_ => live.remove(rnd.nextInt(live.size)))
        Tx("tmp",
          spends.map { case (h, i, _, _) => TxInput(h, i) },
          (0 to rnd.nextInt(2)).map(_ =>
            TxOutput(addrs(rnd.nextInt(addrs.size)), 1000L + rnd.nextInt(9000))))
      }
      val (bytes, real) = CborBlock.encode(
        Block("tmp", height, slot, txs, Era.Conway), prevHash = prev)
      prev = real.hash
      real.transactions.foreach(t => t.outputs.zipWithIndex.foreach {
        case (o, oi) => live += ((t.txHash, oi, o.address, o.lovelace))
      })
      (bytes, real)
    }
    val server = new ChainSyncServer(chain)
    try {
      (0 to reps).foreach { r =>
        val p = new TcpChainProvider("127.0.0.1", server.port, maxDepth = 500)
        val t0 = System.nanoTime()
        var count = 0
        p.startChainSync(Seq.empty).foreach {
          case RollForward(_) => count += 1
          case _ => ()
        }
        val dt = (System.nanoTime() - t0) / 1e9
        val tag = if (r == 0) "warmup" else s"rep$r"
        System.err.println(
          f"[tcpperf] $tag n=$count wall=$dt%.2fs rate=${count / dt}%.0f blk/s " +
            s"maxInflight=${server.maxInflight}")
      }
    } finally server.close()
  }
}
