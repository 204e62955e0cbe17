package graft.tools

import graft.core._
import graft.operators._
import graft.sources.ChainGen
import org.apache.spark.sql.SparkSession

/** Chain-engine throughput: sustained block-events/s through the full
  * reducer graph (the BASELINE.md translation of the reference's
  * ~1,013 blk/s batch-commit sync rate and ≥3,000 envelopes/s gate).
  * Usage: ChainPerf [nBlocks] [batchSize...]
  */
object ChainPerf {
  def main(args: Array[String]): Unit = {
    val nBlocks = if (args.nonEmpty) args(0).toInt else 4000
    val batchSizes = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(500, 2000)
    val spark = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val blocks = ChainGen.generate(nBlocks)
    val events = blocks.map(RollForward.apply)
    def reducers: Seq[ChainReducer] = Seq(
      new BlockSummaryReducer, new TxIndexReducer,
      new WalletUtxoReducer(ChainGen.Watched),
      new BalanceSnapshotReducer(ChainGen.Watched))
    // warmup: JIT + codegen on a small prefix
    locally {
      val w = new GraphRunner(spark,
        new StateStore(java.nio.file.Files.createTempDirectory("perfw").toString, spark),
        reducers, batchSize = 100)
      w.processEvents(events.take(200))
    }
    batchSizes.foreach { bs =>
      val store = new StateStore(
        java.nio.file.Files.createTempDirectory(s"perf$bs").toString, spark)
      val runner = new GraphRunner(spark, store, reducers, batchSize = bs)
      val t0 = System.nanoTime()
      runner.processEvents(events)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[chainperf] blocks=$nBlocks batchSize=$bs wall=$dt%.1fs " +
        f"rate=${nBlocks / dt}%.0f blk/s")
    }
    spark.stop()
  }
}
