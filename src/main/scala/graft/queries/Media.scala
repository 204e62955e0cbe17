package graft.queries

import graft.Tables
import graft.functions.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal pipeline exposure in the correctness catalog. */
object Media extends QueryModule {

  /** Frame geometry for q51: a "frame" is FrameBytes consecutive payload
    * bytes; every FrameStride-th full frame is sampled (video keyframe
    * sampling in shape). Framing is BYTE-exact — payloads are sliced via
    * their hex encoding (2 chars/byte; Spark and DuckDB both emit
    * uppercase hex), so multi-byte UTF-8 content cannot skew offsets.
    */
  private val FrameBytes = 256
  private val FrameStride = 4

  /** q51: frame-sample the binary payload — one row per sampled frame
    * with its digest, plus the total-frame count. The real-decoder
    * version swaps the md5 for a thumbnail/spectrogram extractor
    * (Multimodal.decodeStub's mapPartitions path); the DISTRIBUTED shape
    * is identical: payloads never shuffle, frames explode in the scan
    * stage, output is narrow metadata.
    */
  private def q51(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.attachPayload(Tables.documents(s, d))
    val nFrames = (octet_length(col("payload")) / FrameBytes).cast("long")
    // frames slice the BINARY payload; only the 256-byte frame is ever
    // hexed (r08 review: hexing the whole payload built a 2x-size
    // string per row — past ~1 GiB that hits Spark's 2 GiB value limit
    // and dies, and byte-exact framing never needed it; hex(frame
    // bytes) ≡ the old hex-string slice, so values are unchanged)
    media
      .select(col("doc_id"), nFrames.as("n_frames"), col("payload"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"), col("payload"),
        explode(sequence(lit(0L), col("n_frames") - 1L,
          lit(FrameStride.toLong))).as("frame_idx"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        md5(hex(expr(s"substring(payload, frame_idx * $FrameBytes + 1, " +
          s"$FrameBytes)"))).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private val q51Sql =
    s"""WITH m AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    CAST(octet_length(encode(text)) // $FrameBytes AS BIGINT)
       |      AS n_frames
       |  FROM documents)
       |SELECT doc_id, n_frames,
       |  unnest(range(0, n_frames, $FrameStride)) AS frame_idx,
       |  md5(substring(hx,
       |    unnest(range(0, n_frames, $FrameStride)) * ${2 * FrameBytes} + 1,
       |    ${2 * FrameBytes})) AS frame_md5
       |FROM m WHERE n_frames > 0
       |ORDER BY doc_id, frame_idx""".stripMargin

  override def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q50_multimodal_features",
      (s, d) => Multimodal.featureQuery(s, d),
      Some(Multimodal.featureOracleSql)),
    CatalogEntry("q51_frame_sample", q51, Some(q51Sql)),
  )
}
