package graft.streaming

import graft.queries.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One document's token count and shard — the packer's input unit. */
final case class PackInput(doc_id: Long, n_tok: Long, shard: Long)

/** A document's place in the packed training stream: sequence `seq_no`
  * of its shard, starting at token offset `seq_off`.
  */
final case class PackAssignment(doc_id: Long, shard: Long, seq_no: Long,
    seq_off: Long, n_tok: Long)

/** Streaming sequence packing — the streaming twin of batch q62, so the
  * concat-then-chunk training-shard assignment is not batch-only: an
  * ingestion pipeline can assign every arriving document its final
  * (shard, sequence, offset) slot the moment it lands.
  *
  * Shape: the token/shard projection is STATELESS per-row work
  * (`Dedup.packTokEntries`, bit-identical to q62's batch stage); the
  * only state in the stream is ONE LONG per shard — the shard's next
  * token offset — maintained by `flatMapGroupsWithState`. State is
  * bounded by the shard count forever, regardless of stream length:
  * the strongest possible bounded-state story.
  *
  * Determinism contract: within a micro-batch each shard's documents
  * are packed in doc_id order; across batches, order is arrival order
  * (the offset state makes each batch an exact continuation). A source
  * that delivers documents in doc_id order therefore reproduces batch
  * q62's assignment exactly — StreamingPackSpec pins that convergence.
  *
  * Replay contract (at-least-once sources): under the in-order
  * delivery the convergence contract already assumes, a REDELIVERED
  * document arrives with an id at or below its shard's high-water
  * mark. Such rows are DROPPED — emitting them again would both
  * duplicate the training stream and advance the offset state,
  * permanently shifting every later document's slot (the corruption
  * StreamingDedup's seen-set guards against, achieved here with one
  * extra long of state instead of a set: (next offset, max doc_id)
  * per shard). The trade, stated: a replayed doc does not get its
  * original assignment re-emitted — a sink needing per-row redelivery
  * idempotence dedupes on doc_id, which the q62 determinism makes
  * exact.
  */
object StreamingPack {

  /** Stateless projection over a streaming (or batch) `(doc_id, text)`
    * relation.
    */
  def tokEntries(docs: DataFrame): Dataset[PackInput] = {
    import docs.sparkSession.implicits._
    Dedup.packTokEntries(docs).as[PackInput]
  }

  def assignments(toks: Dataset[PackInput],
      budget: Long = 2048L): Dataset[PackAssignment] = {
    import toks.sparkSession.implicits._
    toks.groupByKey(_.shard)
      .flatMapGroupsWithState[(Long, Long), PackAssignment](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard, chunk, state) =>
          var (off, hiId) = state.getOption.getOrElse((0L, Long.MinValue))
          val out = chunk.toSeq.sortBy(_.doc_id).flatMap { p =>
            if (p.doc_id <= hiId) None // replayed under in-order delivery
            else {
              val start = off
              off += p.n_tok
              hiId = p.doc_id
              Some(PackAssignment(p.doc_id, shard, start / budget,
                start % budget, p.n_tok))
            }
          }
          state.update((off, hiId))
          out.iterator
      }
  }
}
