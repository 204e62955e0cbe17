package graft

import graft.functions.Multimodal
import org.apache.spark.sql.functions._

/** Exercises the multimodal plumbing end-to-end on real testdata,
  * including the stub-decoded feature vector the DuckDB oracle can't see.
  */
class MultimodalSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("payload bytes + sha + frame samples are consistent and deterministic") {
    val sp = spark
    import sp.implicits._
    val media = Multimodal.attachPayload(Tables.documents(spark, sf))
      .as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(media).toDF().cache()
    try {
      val docs = Tables.documents(spark, sf)
      // n_bytes equals the engine's own byte length of the text
      val mismatch = feats.join(docs, "doc_id")
        .filter(col("n_bytes") =!= octet_length(col("text").cast("binary")))
        .count()
      assert(mismatch == 0)
      // sha256 agrees with Spark's builtin over the same bytes
      val shaBad = feats.join(Multimodal.attachPayload(docs), "doc_id")
        .filter(col("sha256") =!= sha2(col("payload"), 256)).count()
      assert(shaBad == 0)
      // frame samples: 8 values in [0,1], deterministic across runs
      val bad = feats.filter(size(col("frame_sample")) =!= 8 ||
        exists(col("frame_sample"), v => v < 0.0 || v > 1.0)).count()
      assert(bad == 0)
      val again = Multimodal.extractFeatures(media).toDF()
      assert(feats.exceptAll(again).count() == 0)
    } finally feats.unpersist()
  }

  test("repartitionBySize bounds partition payload bytes") {
    val media = Multimodal.attachPayload(Tables.documents(spark, sf))
    val parts = Multimodal.repartitionBySize(media, targetBytes = 16 * 1024)
      .rdd.getNumPartitions
    val total = media.agg(sum(octet_length(col("payload")))).head().getLong(0)
    val expected = math.max(1, math.ceil(total.toDouble / (16 * 1024)).toInt)
    assert(parts == expected)
  }
}
