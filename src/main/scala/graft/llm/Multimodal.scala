package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Codecs.{BmpCodec, PpmCodec, WavCodec}

/** Multimodal-column plumbing for LLM training-data pipelines.
  *
  * Media (image/audio/video) is carried as an opaque `binary` payload
  * column plus a typed metadata struct; decode/feature-extraction runs
  * as a partition-local batch transform (`mapPartitions` over the row
  * iterator — the Scala analogue of `mapInPandas`). The decode itself is
  * REAL: [[Codecs.PpmCodec]] / [[Codecs.BmpCodec]] parse actual image
  * byte layouts (netpbm P6, 24-bit BMP) and [[Codecs.WavCodec]] parses
  * RIFF/WAVE PCM — width/height/sample-rate in the output come from the
  * bytes, not from trusted metadata.
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

  /** Attach a REAL binary PPM (P6) payload synthesized from the text
    * bytes: header `P6\n<w> <h>\n255\n` + w·h·3 pixel bytes (the text,
    * truncated/space-padded). Dimensions vary per id (w ∈ 8..16,
    * h ∈ 8..14) so a downstream decode must genuinely parse them back
    * out of the header — and an oracle can recompute them from the id.
    * Pure Catalyst expressions: the construction is codegen'd and
    * engine-portable (the DuckDB twin is the same string algebra).
    *
    * The pixel section is BYTE-exact: the text is folded to ASCII
    * (every non-ASCII code point → '?') before the char-counted
    * substring/rpad, so w·h·3 CHARS is w·h·3 BYTES. Without the fold a
    * multibyte document (the corpus includes zh text) would inflate the
    * UTF-8 payload past the decoder's w·h·3-byte read, leaving tail
    * bytes the pixel fingerprint ignores but a whole-payload oracle
    * compares — a Spark/oracle divergence class, not a cosmetic one.
    */
  def withPpmPayload(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    df.withColumn("_w", (col(idCol) % 9 + 8).cast("int"))
      .withColumn("_h", (col(idCol) % 7 + 8).cast("int"))
      .withColumn("_npx", col("_w") * col("_h") * 3)
      .withColumn("_ascii", regexp_replace(col(textCol), "[^\\x01-\\x7F]", "?"))
      .withColumn("payload", concat(
        lit("P6\n"), col("_w").cast("string"), lit(" "),
        col("_h").cast("string"), lit("\n255\n"),
        expr("rpad(substring(_ascii, 1, _npx), _npx, ' ')")).cast("binary"))
      .withColumn("media_meta", struct(
        lit("image").as("kind"),
        lit("image/x-portable-pixmap").as("format"),
        col("_w").as("width"),
        col("_h").as("height"),
        lit(0L).as("duration_ms")))
      .drop("_w", "_h", "_npx", "_ascii")

  /** L1-normalised byte histogram — the feature extractor fed by the
    * decoded pixel/sample bytes.
    */
  def byteHistogram(bytes: Array[Byte], bins: Int): Array[Double] = {
    val counts = new Array[Double](bins)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) & 0xFF) * bins / 256) += 1.0
      i += 1
    }
    val n = math.max(bytes.length, 1).toDouble
    counts.map(_ / n)
  }

  /** Schema of [[decodeImage]] output rows. */
  def imageFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("valid", BooleanType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("pixel_md5", StringType),
    StructField("feature", ArrayType(DoubleType))))

  /** Partition-local REAL image decode (the `mapInPandas` analogue):
    * sniffs PPM then BMP, parses width/height out of the payload bytes,
    * fingerprints the decoded RGB pixels (`pixel_md5` — the
    * CONTENT-level identity: the same pixels through PPM or BMP
    * containers fingerprint identically, which container-level hashing
    * cannot give you), and histograms them into a `bins`-long feature
    * (the NEAR-dup signal — histograms deliberately collapse
    * pixel-order, so exact identity must key on the fingerprint, not
    * the feature). Malformed payloads yield `valid = false` with null
    * dims/fingerprint/feature — a corrupt media file must quarantine,
    * not kill a 100 TB pass. Input needs (doc_id: long, payload:
    * binary); runs entirely executor-side, no shuffle.
    */
  def decodeImage(df: DataFrame, bins: Int = 64)
      (implicit spark: SparkSession): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imageFeatureSchema)
    df.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getLong(0)
          val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          PpmCodec.decode(payload).orElse(BmpCodec.decode(payload)) match {
            case Some((w, h, rgb)) =>
              md.reset()
              val hex = md.digest(rgb).map("%02x".format(_)).mkString
              Row(id, payload.length.toLong, true, w, h, hex,
                byteHistogram(rgb, bins))
            case None =>
              Row(id, payload.length.toLong, false, null, null, null, null)
          }
        }
      }(enc)
  }

  /** Schema of [[decodeAudio]] output rows. */
  def audioFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("valid", BooleanType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_ms", LongType),
    StructField("rms", DoubleType)))

  /** Partition-local REAL audio decode: RIFF/WAVE PCM16 parse →
    * sample-rate/duration from the chunks, RMS amplitude from the
    * samples. Same quarantine contract as [[decodeImage]].
    */
  def decodeAudio(df: DataFrame)
      (implicit spark: SparkSession): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioFeatureSchema)
    df.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          WavCodec.decode(payload) match {
            case Some((rate, samples)) =>
              Row(id, payload.length.toLong, true, rate, samples.length.toLong,
                WavCodec.durationMs(rate, samples.length), WavCodec.rms(samples))
            case None =>
              Row(id, payload.length.toLong, false, null, null, null, null)
          }
        }
      }(enc)
  }

  /** Real nearest-neighbour image resize: decode (PPM or BMP) →
    * resample → re-encode as PPM. None when the payload doesn't parse.
    */
  def resizeImage(payload: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] =
    PpmCodec.decode(payload).orElse(BmpCodec.decode(payload)).map {
      case (w, h, rgb) =>
        val out = new Array[Byte](outW * outH * 3)
        var y = 0
        while (y < outH) {
          val sy = y * h / outH
          var x = 0
          while (x < outW) {
            val sx = x * w / outW
            var c = 0
            while (c < 3) {
              out((y * outW + x) * 3 + c) = rgb((sy * w + sx) * 3 + c)
              c += 1
            }
            x += 1
          }
          y += 1
        }
        PpmCodec.encode(outW, outH, out)
    }

  /** Frame sampling over a raw byte stream: every `stride`-th window
    * stands in for a video frame grab (no public pure-JVM video codec —
    * the honest byte-level stand-in, clearly labeled).
    */
  def sampleFrames(payload: Array[Byte], stride: Int, frameLen: Int): Seq[Array[Byte]] =
    payload.grouped(stride).map(_.take(frameLen)).toSeq

  /** Metadata-only projection for shuffle-heavy downstream work: at scale,
    * join/group on this and re-attach payloads last via the id.
    */
  def metaOnly(df: DataFrame, idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), col("media_meta"),
      octet_length(col("payload")).cast("long").as("n_bytes"))

  // -------------------------------------------------- perceptual hashing

  /** 64-bit difference hash (dHash) of a decoded RGB image: integer
    * grayscale (r+g+b)/3, nearest-neighbour downsample to a 9×8 grid,
    * bit (gy·8+gx) set iff gray(gx+1, gy) > gray(gx, gy). Invariant to
    * any uniform brightness shift that doesn't clip (adding c to every
    * channel adds exactly c to every gray value, preserving every
    * strict comparison) and to the container (it sees decoded pixels) —
    * the two near-dup classes exact pixel hashing misses. All-integer
    * arithmetic: engine/platform deterministic.
    */
  def dHash64(w: Int, h: Int, rgb: Array[Byte]): Long = {
    def gray(gx: Int, gy: Int): Int = {
      val px = gx * w / 9
      val py = gy * h / 8
      val i = (py * w + px) * 3
      ((rgb(i) & 0xFF) + (rgb(i + 1) & 0xFF) + (rgb(i + 2) & 0xFF)) / 3
    }
    var bits = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (gray(gx + 1, gy) > gray(gx, gy))
          bits |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** Schema of [[imagePHash]] output rows. */
  def imagePHashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("valid", BooleanType),
    StructField("dhash", LongType),
    StructField("grad_md5", StringType)))

  /** Partition-local perceptual-hash pass (the near-dup sibling of
    * [[decodeImage]]): decode (PPM or BMP), emit the 64-bit [[dHash64]]
    * — the Hamming-banded BLOCKING key — plus `grad_md5`, the md5 of
    * `w,h,` followed by the brightness-normalized byte gradient
    * ((b_i − b_0) mod 256, comma-joined decimals): the exact VERIFY
    * fingerprint. Two images share `grad_md5` iff they have the SAME
    * DIMENSIONS and their pixel bytes differ by one per-image constant
    * — which forces equal gray GRIDS up to a constant and hence equal
    * dHash, so a banded candidate join over dhash surfaces every
    * grad-equal pair (the recall argument the oracle checks). The w,h
    * prefix is load-bearing for that argument: gradient-equal payloads
    * with TRANSPOSED dims (w1·h1 == w2·h2) sample different grids, so
    * without it the oracle would pair two images the Hamming banding
    * can legitimately miss.
    * Engine-portable: the oracle replays the gradient algebra over the
    * payload construction with no knowledge of the hash grid. Corrupt
    * payloads quarantine as valid = false, like every decoder here.
    */
  def imagePHash(df: DataFrame)
      (implicit spark: SparkSession): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imagePHashSchema)
    df.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getLong(0)
          val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          PpmCodec.decode(payload).orElse(BmpCodec.decode(payload)) match {
            case Some((w, h, rgb)) if rgb.nonEmpty =>
              md.reset()
              val b0 = rgb(0) & 0xFF
              val grad = s"$w,$h," + rgb.iterator
                .map(b => (((b & 0xFF) - b0 + 256) % 256).toString)
                .mkString(",")
              val hex = md.digest(grad.getBytes("US-ASCII"))
                .map("%02x".format(_)).mkString
              Row(id, true, dHash64(w, h, rgb), hex)
            case _ => Row(id, false, null, null)
          }
        }
      }(enc)
  }

  /** Attach a REAL RIFF/WAVE PCM16 payload synthesized from the text
    * bytes (the audio sibling of [[withPpmPayload]]): sample count
    * (256 + id%5·64) and sample rate (8000 + id%3·4000) vary per id so
    * a downstream decode must parse them back out of the chunks, and
    * sample i is `ascii_code(text_i) · 100` — non-negative, ≤ 12700, so
    * a ×2 gain twin never clips. The text is ASCII-folded with the SAME
    * regex as the PPM builder (chars == bytes, and the oracle replays
    * the identical code algebra); the binary container is produced by
    * the real [[Codecs.WavCodec]] encoder executor-side.
    */
  def withWavPayload(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id")(implicit spark: SparkSession): DataFrame = {
    val prepared = df
      .withColumn("_n", (col(idCol) % 5 * 64 + 256).cast("int"))
      .withColumn("_rate", (col(idCol) % 3 * 4000 + 8000).cast("int"))
      .withColumn("_ascii", regexp_replace(col(textCol), "[^\\x01-\\x7F]", "?"))
      .select(col(idCol).cast("long").as("doc_id"), col("_rate"),
        expr("rpad(substring(_ascii, 1, _n), _n, ' ')").as("_chars"))
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType))))
    prepared.mapPartitions(_.map { r =>
      val chars = r.getString(2)
      val samples = new Array[Short](chars.length)
      var i = 0
      while (i < chars.length) {
        samples(i) = (chars.charAt(i).toInt * 100).toShort; i += 1
      }
      Row(r.getLong(0), WavCodec.encode(r.getInt(1), samples))
    })(enc)
  }

  /** Uniform gain shift of a WAV payload: every sample × `g` through
    * the real codec round-trip. Refuses (None) when any scaled sample
    * would clip out of Int16 — a clipped gain is NOT envelope-invariant,
    * and the planted-twin construction depends on exact invariance
    * (the [[brightnessShiftPpm]] contract).
    */
  def gainShiftWav(g: Int)(payload: Array[Byte]): Option[Array[Byte]] =
    WavCodec.decode(payload).flatMap { case (rate, samples) =>
      if (samples.exists(s => s * g > 32767 || s * g < -32768)) None
      else Some(WavCodec.encode(rate,
        samples.map(s => (s * g).toShort)))
    }

  /** Schema of [[audioFingerprint]] output rows. */
  def audioFingerprintSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("valid", BooleanType),
    StructField("ahash", LongType),
    StructField("env_md5", StringType)))

  /** Partition-local perceptual AUDIO fingerprint (the near-dup sibling
    * of [[imagePHash]]): decode (RIFF/WAVE PCM16), emit
    *
    *   - `ahash`, the 64-bit energy-ENVELOPE hash — the Hamming-banded
    *     BLOCKING key: the samples split into 65 equal frames, frame
    *     energy e_j = Σ|s_i| (a Long — exact), bit j set iff
    *     e_(j+1) > e_j. Invariant to any uniform non-clipping gain
    *     (every energy scales by |g|, preserving every strict
    *     comparison) and to the container framing — the near-dup
    *     classes exact byte hashing misses.
    *   - `env_md5`, the exact VERIFY fingerprint: md5 of
    *     `rate,` + the gcd-NORMALIZED samples (s_i ÷ gcd of all |s_i|,
    *     comma-joined — exact integer division by construction). Two
    *     clips share `env_md5` iff they have the same rate, the same
    *     length, and sample arrays that are EXACTLY proportional
    *     (s = g_s·n, t = g_t·n) — which forces proportional frame
    *     energies and hence equal `ahash`, so a banded candidate join
    *     over ahash surfaces every env-equal pair (the same airtight
    *     recall argument as [[imagePHash]]'s w,h-prefixed gradient;
    *     a floor-based normalization would not give it).
    *
    * Engine-portable: the oracle replays the gcd algebra over the
    * payload construction with no knowledge of the frame grid. Corrupt
    * payloads quarantine as valid = false.
    */
  def audioFingerprint(df: DataFrame)
      (implicit spark: SparkSession): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioFingerprintSchema)
    df.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getLong(0)
          val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          WavCodec.decode(payload) match {
            case Some((rate, samples)) if samples.length >= 65 =>
              val n = samples.length
              var g = 0L
              var i = 0
              while (i < n) {
                g = java.math.BigInteger.valueOf(g)
                  .gcd(java.math.BigInteger.valueOf(math.abs(samples(i).toLong)))
                  .longValue()
                i += 1
              }
              val norm = new Array[Long](n)
              i = 0
              while (i < n) {
                norm(i) = if (g == 0L) 0L else samples(i) / g
                i += 1
              }
              var bits = 0L
              var j = 0
              var ePrev = frameEnergy(samples, 0, n)
              while (j < 64) {
                val eNext = frameEnergy(samples, j + 1, n)
                if (eNext > ePrev) bits |= 1L << j
                ePrev = eNext
                j += 1
              }
              md.reset()
              val hex = md.digest((s"$rate," + norm.mkString(","))
                .getBytes("US-ASCII")).map("%02x".format(_)).mkString
              Row(id, true, bits, hex)
            case _ => Row(id, false, null, null)
          }
        }
      }(enc)
  }

  /** Σ|s_i| over frame j of 65 equal frames — exact Long arithmetic. */
  private def frameEnergy(samples: Array[Short], j: Int, n: Int): Long = {
    var e = 0L
    var i = j * n / 65
    val end = (j + 1) * n / 65
    while (i < end) { e += math.abs(samples(i).toLong); i += 1 }
    e
  }

  /** Map a payload column through a partition-local codec transform
    * (None → quarantined as a null payload): the twin-construction and
    * re-encode hook for the perceptual-dedup gates. Runs executor-side,
    * no shuffle — the [[decodeImage]] plumbing contract.
    */
  def mapPayload(df: DataFrame, f: Array[Byte] => Option[Array[Byte]])
      (implicit spark: SparkSession): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType))))
    df.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions(_.map { r =>
        val p = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        Row(r.getLong(0), f(p).orNull)
      })(enc)
  }

  /** Uniform brightness shift of a PPM payload: +delta on every pixel
    * byte. Refuses (None) when any byte would clip — a clipped shift is
    * NOT dHash-invariant, and the planted-twin construction depends on
    * exact invariance.
    */
  def brightnessShiftPpm(delta: Int)(payload: Array[Byte]): Option[Array[Byte]] =
    PpmCodec.decode(payload).flatMap { case (w, h, rgb) =>
      if (rgb.exists(b => (b & 0xFF) + delta > 255 || (b & 0xFF) + delta < 0))
        None
      else
        Some(PpmCodec.encode(w, h, rgb.map(b => ((b & 0xFF) + delta).toByte)))
    }

  /** Re-encode any decodable payload as BMP — same pixels, different
    * container (the re-crawl-through-a-different-pipeline twin). */
  def reencodeBmp(payload: Array[Byte]): Option[Array[Byte]] =
    PpmCodec.decode(payload).orElse(BmpCodec.decode(payload)).map {
      case (w, h, rgb) => BmpCodec.encode(w, h, rgb)
    }
}
