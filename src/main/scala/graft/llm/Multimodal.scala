package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for LLM training-data pipelines.
  *
  * Media (image/audio/video) is carried as an opaque `binary` payload
  * column plus a typed metadata struct; decode/feature-extraction runs as
  * a partition-local batch transform (`mapPartitions` over an Arrow-sized
  * iterator), which is the Scala analogue of `mapInPandas`: the Spark-side
  * contract — schema, partitioning, batch shape — is real; only the codec
  * call itself is stubbed (no image/audio libraries in this environment,
  * see the builder brief) behind [[StubCodec]].
  *
  * Scale notes: payloads never pass through a shuffle here — decode is a
  * map stage pinned to the scan; metadata-only columns are projected for
  * any downstream joins so the binary bytes stay columnar in parquet and
  * are pruned unless a stage actually decodes.
  */
object Multimodal {

  /** Typed metadata accompanying every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),         // "image" | "audio" | "video"
    StructField("format", StringType),       // container/codec tag
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Attach a payload + metadata to a table (here synthesized from text
    * bytes — in production this is the parquet binary column as-written).
    */
  def withSyntheticPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("media_meta", struct(
        lit("image").as("kind"),
        lit("fake/raw").as("format"),
        lit(64).cast("int").as("width"),
        lit(64).cast("int").as("height"),
        lit(0L).as("duration_ms")))

  /** The stubbed codec boundary. Deterministic fake "decode": summarises
    * the payload bytes. A real deployment swaps this object for JNI/
    * library calls with the same signature; nothing else changes.
    */
  object StubCodec {
    /** "Decode" → fixed-length feature vector (byte histogram over 8
      * bins, L1-normalised) + basic stats. Deterministic in the payload.
      */
    def decodeFeatures(payload: Array[Byte], bins: Int = 8): Array[Double] = {
      val counts = new Array[Double](bins)
      var i = 0
      while (i < payload.length) {
        counts((payload(i) & 0xFF) * bins / 256) += 1.0
        i += 1
      }
      val n = math.max(payload.length, 1).toDouble
      counts.map(_ / n)
    }

    /** "Frame-sample": every `stride`-th byte window stands in for a video
      * frame grab.
      */
    def sampleFrames(payload: Array[Byte], stride: Int, frameLen: Int): Seq[Array[Byte]] =
      payload.grouped(stride).map(_.take(frameLen)).toSeq

    /** "Resize": truncate/pad to the target byte budget. */
    def resize(payload: Array[Byte], targetBytes: Int): Array[Byte] =
      java.util.Arrays.copyOf(payload, targetBytes)
  }

  /** Schema of [[decodeFeatures]] output rows. */
  def featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(DoubleType))))

  /** Partition-local decode: the `mapInPandas` analogue. Input must have
    * (doc_id: long, payload: binary); output one feature row per media
    * item. Runs entirely executor-side, no shuffle.
    */
  def decodeFeatures(df: DataFrame, bins: Int = 8)
      (implicit spark: SparkSession): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    df.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          // NULL media ⇒ empty payload (0 bytes, all-zero histogram)
          val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          Row(id, payload.length.toLong, StubCodec.decodeFeatures(payload, bins))
        }
      }(enc)
  }

  /** Metadata-only projection for shuffle-heavy downstream work: at scale,
    * join/group on this and re-attach payloads last via the id.
    */
  def metaOnly(df: DataFrame, idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), col("media_meta"),
      octet_length(col("payload")).cast("long").as("n_bytes"))
}
