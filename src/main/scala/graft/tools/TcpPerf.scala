package graft.tools

import graft.core._
import graft.sources._

/** Measure the loopback bearers' decode-only ceilings — the analogue
  * of the reference's ~1,900 blk/s "NoOp sink" number
  * (`unified-branch-batch-commit.md:38-40`): blocks pulled through the
  * socket with adaptive pipelining and REAL-CBOR decode, no engine
  * behind it. Covers BOTH the plain chain-sync bearer and the
  * multiplexed headers+BlockFetch bearer (whose extra round trips per
  * run are the cost of the reference's real N2N shape).
  * Usage: `runMain graft.tools.TcpPerf [nBlocks] [reps]`.
  */
object TcpPerf {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(4000)
    val reps = if (args.length > 1) args(1).toInt else 3
    val chain = CborChainGen.generate(n, seed = 9)
    def measure(tag: String, mkProvider: () => ChainProvider,
        maxInflight: () => Int): Unit =
      (0 to reps).foreach { r =>
        val p = mkProvider()
        val t0 = System.nanoTime()
        var count = 0
        p.startChainSync(Seq.empty).foreach {
          case RollForward(_) => count += 1
          case _ => ()
        }
        val dt = (System.nanoTime() - t0) / 1e9
        val lbl = if (r == 0) "warmup" else s"rep$r"
        System.err.println(
          f"[$tag] $lbl n=$count wall=$dt%.2fs rate=${count / dt}%.0f blk/s " +
            s"maxInflight=${maxInflight()}")
      }
    val server = new ChainSyncServer(chain)
    try measure("tcpperf",
      () => new TcpChainProvider("127.0.0.1", server.port, maxDepth = 500),
      () => server.maxInflight)
    finally server.close()
    val mux = new MuxChainSyncServer(chain)
    try measure("muxperf",
      () => new MuxChainProvider("127.0.0.1", mux.port, maxDepth = 500),
      () => mux.maxInflight)
    finally mux.close()
  }
}
