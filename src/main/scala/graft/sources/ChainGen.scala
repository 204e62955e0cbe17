package graft.sources

import graft.core._
import scala.collection.mutable
import scala.util.Random

/** Deterministic synthetic chain generator — the test analogue of the
  * reference's committed 100-block CBOR corpus + `MockChainSyncProvider`
  * (SURVEY.md §5.2: `Mocks/MockChainSyncProvider.cs:29-139`). Seeded, so
  * every run and both the engine and the independent oracle see the same
  * chain.
  *
  * The tx graph is chain-valid: an input only ever spends an output
  * created in an EARLIER block or earlier in the SAME block (exercising
  * the read-your-own-writes ordering of reference O8,
  * `LovelaceBalanceByAddressReducer.cs:81-97`).
  */
object ChainGen {

  val Addresses: Seq[String] = (0 until 8).map(i => f"addr$i%02x")

  /** addressName dimension — the reference's config-loaded watched set
    * (`LovelaceBalanceByAddressReducer.cs:26-36`).
    */
  val Watched: Map[String, String] =
    Map("addr00" -> "alice", "addr01" -> "bob", "addr02" -> "carol")

  /** `tag` disambiguates tx/block hashes across independent `generate`
    * calls (e.g. an alternative fork suffix in a reorg test) — without
    * it two chains would mint identical (txHash, txIndex) pairs.
    */
  def generate(nBlocks: Int, seed: Long = 42L,
      startSlot: Long = 1000L, tag: String = ""): Seq[Block] = {
    val rnd = new Random(seed)
    // live pool of unspent outputs: (txHash, index, address, lovelace)
    val live = mutable.ArrayBuffer[(String, Int, String, Long)]()
    var slot = startSlot
    var height = 100L
    (0 until nBlocks).map { bi =>
      slot += 1 + rnd.nextInt(3)
      height += 1
      val hash = f"blk$tag$bi%06d-$slot"
      val nTx = rnd.nextInt(4) // 0..3
      val txs = (0 until nTx).map { ti =>
        val txHash = f"tx$tag$bi%06d-$ti"
        // spend up to 2 live outputs with probability
        val nSpend = if (live.nonEmpty) rnd.nextInt(3).min(live.size) else 0
        // nSpend is clamped to live.size and each draw removes one
        // element, so the pool can never empty mid-loop (same RNG call
        // sequence as before — seeds pin fixtures across the suite)
        val spends = (0 until nSpend).map(_ =>
          live.remove(rnd.nextInt(live.size)))
        val inputs = spends.map { case (h, i, _, _) => TxInput(h, i) }
        val outputs = (0 to rnd.nextInt(2)).map { oi =>
          TxOutput(Addresses(rnd.nextInt(Addresses.size)),
            1000L + rnd.nextInt(9000))
        }
        outputs.zipWithIndex.foreach { case (o, oi) =>
          live += ((txHash, oi, o.address, o.lovelace))
        }
        Tx(txHash, inputs, outputs)
      }
      Block(hash, height, slot, txs)
    }
  }

  /** Independent oracle: imperative fold over blocks (a deliberately
    * different algorithm from the engine's set-based DataFrames) producing
    * the unspent balance per watched address after every block — the
    * §5.3 oracle discipline (`LovelaceBalanceRollbackTest.cs:60-74`).
    */
  def balanceOracle(blocks: Seq[Block],
      watched: Map[String, String] = Watched)
      : Seq[(Long, Map[String, Long])] = {
    val live = mutable.Map[(String, Int), (String, Long)]() // (tx,i) -> (addr, amt)
    blocks.map { b =>
      b.transactions.foreach { tx =>
        // reference order: outputs registered before inputs are matched
        // would break same-block spends; Argus registers outputs first
        // (LovelaceBalanceByAddressReducer.cs:81-97). Our generator never
        // spends same-tx outputs, and spends earlier-same-block outputs
        // only after they were added below — so process per tx in order.
        tx.outputs.zipWithIndex.foreach { case (o, i) =>
          live((tx.txHash, i)) = (o.address, o.lovelace)
        }
        tx.inputs.foreach(in => live.remove((in.txId, in.index)))
      }
      val bal = watched.map { case (addr, name) =>
        name -> live.collect { case ((_, _), (a, amt)) if a == addr => amt }.sum
      }
      (b.slot, bal)
    }
  }
}
