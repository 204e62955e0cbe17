package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, processed by a batched per-partition pipeline.
  *
  * The Spark-side plumbing here is real — schema, partition sizing,
  * batched iteration shape — while the actual media decoding is STUBBED
  * (this container has no image/audio codecs): `decodeStub` derives
  * deterministic pseudo-features from the bytes. Swapping in a real
  * decoder (JNI/ffmpeg/javacv) changes only the body of `decodeStub`;
  * nothing about the distributed plan.
  *
  * At 100 TB: payloads never shuffle (features are extracted in the scan
  * stage); `repartitionBySize` bounds partition payload bytes so executor
  * memory is sized by config, not by data skew.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

  /** Stub decode output — deterministic fake features standing in for
    * decode/resize/frame-sample results.
    */
  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      sha256: String,
      // stand-in for a decoded feature vector (e.g. thumbnail histogram):
      // 8 evenly-spaced byte samples, normalized to [0,1]
      frame_sample: Array[Double])

  /** Attach a binary payload + metadata struct to `documents` (the text
    * bytes stand in for an image/audio blob).
    */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("mime"),
      col("text").cast("binary").as("payload"))

  /** STUB: deterministic fake decode. A real implementation would parse
    * the container format here; everything around it is production-shaped.
    */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val md = MessageDigest.getInstance("SHA-256")
    val sha = md.digest(r.payload).map("%02x".format(_)).mkString
    val n = r.payload.length
    val sample = (0 until 8).map { i =>
      if (n == 0) 0.0
      else (r.payload(math.min(n - 1, i * math.max(1, n / 8))) & 0xff) / 255.0
    }.toArray
    MediaFeatures(r.doc_id, r.mime, n.toLong, sha, sample)
  }

  /** Batched per-partition feature extraction — the Scala analogue of a
    * pandas_func over mapInPandas: one iterator pass per partition, heavy
    * init (the decoder) amortized per partition, constant memory.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init lives here (decoder handles, model weights...)
      it.map(decodeStub)
    }
  }

  /** Size-bounded repartition: target ~`targetBytes` of payload per
    * partition, so decode memory is bounded regardless of row-size skew.
    */
  def repartitionBySize(media: DataFrame, targetBytes: Long): DataFrame = {
    val total = media.agg(sum(octet_length(col("payload")))).head().getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    media.repartition(parts)
  }

  /** End-to-end pipeline as a catalog query (oracle-able columns only —
    * the frame_sample stub output is exercised by MultimodalSpec).
    */
  def featureQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = attachPayload(graft.Tables.documents(spark, sfDir))
      .as[MediaRow]
    extractFeatures(media).toDF()
      .select(col("doc_id"), col("mime"), col("n_bytes"), col("sha256"))
      .orderBy(col("doc_id"))
  }

  val featureOracleSql: String =
    """SELECT doc_id, 'text/plain' AS mime,
      |  octet_length(encode(text)) AS n_bytes,
      |  sha256(text) AS sha256
      |FROM documents ORDER BY doc_id""".stripMargin
}
