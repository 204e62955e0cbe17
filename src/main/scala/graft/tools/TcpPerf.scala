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
    val chain = CborChainGen.generate(n, seed = 9)
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
