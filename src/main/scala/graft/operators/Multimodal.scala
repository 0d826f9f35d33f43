package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.9): image/audio/video as opaque
  * `binary` columns with typed metadata.
  *
  * [[decode]] does REAL byte parsing for the three container formats whose
  * headers are pure arithmetic (no codec library needed): BMP, WAV (RIFF)
  * and binary PPM. Payloads that match none of the magics fall back to
  * [[decodeStub]]'s deterministic fake — the honest posture for this
  * sandbox, where the synthetic corpus carries text bytes, not media; a
  * production swap-in (JPEG/MP4 via a codec lib) replaces only the decoder
  * body, never the Spark plumbing (schema, typed mapPartitions batching,
  * null/corrupt-row skipping).
  */
object Multimodal {

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Deterministic fake decoder — a real implementation would parse the
    * container header here. Kept arithmetic-only so the DuckDB oracle can
    * replay it from byte length.
    */
  def decodeStub(bytes: Array[Byte]): (Long, Int, Int, Int) = {
    val n = bytes.length.toLong
    (n, (n % 512).toInt, (n * 7 % 512).toInt, (n % 16).toInt)
  }

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** BMP header: 'BM', int32-LE width at offset 18, height at 22 (negative
    * height = top-down row order → abs). Single frame. */
  def decodeBmp(b: Array[Byte]): Option[(Long, Int, Int, Int)] =
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some((b.length.toLong, leInt(b, 18), math.abs(leInt(b, 22)), 1))
    else None

  /** Canonical 44-byte-header WAV (RIFF/WAVE, 'fmt ' then 'data'): width =
    * sample rate (int32-LE at 24), height = channels (int16-LE at 22),
    * n_frames = sample frames = dataSize / blockAlign. */
  def decodeWav(b: Array[Byte]): Option[(Long, Int, Int, Int)] =
    if (b.length >= 44 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E' &&
        b(12) == 'f' && b(13) == 'm' && b(14) == 't' &&
        b(36) == 'd' && b(37) == 'a' && b(38) == 't' && b(39) == 'a') {
      val channels = leShort(b, 22)
      val rate = leInt(b, 24)
      val blockAlign = leShort(b, 32)
      val dataSize = leInt(b, 40)
      if (channels <= 0 || blockAlign <= 0) None
      else Some((b.length.toLong, rate, channels, dataSize / blockAlign))
    } else None

  /** Binary PPM (P6): ASCII "P6", whitespace/comment-separated width,
    * height, maxval, then raw pixels. Single frame. */
  def decodePpm(b: Array[Byte]): Option[(Long, Int, Int, Int)] =
    if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
      var i = 2
      def nextInt(): Option[Int] = {
        // skip whitespace and '#'-to-newline comments
        var ok = true
        while (ok && i < b.length) {
          if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
          else if (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t') i += 1
          else ok = false
        }
        val start = i
        while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
        if (i > start) Some(new String(b, start, i - start,
          java.nio.charset.StandardCharsets.US_ASCII).toInt) else None
      }
      for (w <- nextInt(); h <- nextInt(); _ <- nextInt())
        yield (b.length.toLong, w, h, 1)
    } else None

  /** Real decode with stub fallback (see object scaladoc). */
  def decode(bytes: Array[Byte]): (Long, Int, Int, Int) =
    decodeBmp(bytes)
      .orElse(decodeWav(bytes))
      .orElse(decodePpm(bytes))
      .getOrElse(decodeStub(bytes))

  private def putLeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  /** Minimal bit-exact BMP (54-byte BITMAPINFOHEADER, no pixel payload —
    * the decoders here read only headers): fixture generator for specs and
    * the q636 real-decode query, since the sandbox ships no real media.
    */
  def makeBmp(width: Int, height: Int): Array[Byte] = {
    val b = new Array[Byte](54)
    b(0) = 'B'; b(1) = 'M'
    putLeInt(b, 2, 54); putLeInt(b, 10, 54); putLeInt(b, 14, 40)
    putLeInt(b, 18, width); putLeInt(b, 22, height)
    b(26) = 1; b(28) = 24
    b
  }

  /** Canonical 44-byte-header WAV with `frames` zero samples (16-bit PCM). */
  def makeWav(rate: Int, channels: Int, frames: Int): Array[Byte] = {
    val blockAlign = channels * 2
    val dataSize = frames * blockAlign
    val b = new Array[Byte](44 + dataSize)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    putLeInt(b, 4, 36 + dataSize)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    putLeInt(b, 16, 16); b(20) = 1
    b(22) = (channels & 0xff).toByte; b(23) = ((channels >> 8) & 0xff).toByte
    putLeInt(b, 24, rate); putLeInt(b, 28, rate * blockAlign)
    b(32) = (blockAlign & 0xff).toByte; b(33) = ((blockAlign >> 8) & 0xff).toByte
    b(34) = 16
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
    putLeInt(b, 40, dataSize)
    b
  }

  /** Attach an opaque media column (here: the UTF-8 bytes of `textCol`;
    * in production: real image/audio payloads read via `binaryFile` source).
    */
  def withMediaColumn(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", col(textCol).cast("binary"))

  /** Decode / feature-extract over the binary column. Runs as a TYPED
    * `Dataset.mapPartitions` — stays on the unsafe-row path (the earlier
    * `df.rdd` formulation exited Tungsten and round-tripped every row
    * through `GenericRow`) while keeping the per-partition iterator hook a
    * real decoder needs to amortize codec init per batch (the Arrow/
    * pandas-UDF batch shape in Scala form).
    */
  def extractMeta(
      df: DataFrame,
      idCol: String,
      decoder: Array[Byte] => (Long, Int, Int, Int) = decodeStub): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null media (e.g. a null-text row cast to binary) would NPE the
    // decoder and kill the stage — undecodable rows are skipped.
    // The default decoder stays the STUB: the corpus carries text bytes,
    // and a text that happens to start with 'BM' must not be data-
    // dependently parsed as an image under the stub-arithmetic oracle.
    // Pass [[decode]] explicitly when the media column holds real
    // containers (q636 does).
    df.select(col(idCol).cast("long"), col("media"))
      .filter(col("media").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec init" would go here
        it.map { case (id, bytes) =>
          val (n, w, h, f) = decoder(bytes)
          (id, n, w, h, f)
        }
      }
      .toDF(idCol, "n_bytes", "width", "height", "n_frames")
  }

  /** Resize step (stub): halve dimensions `factor` times, floor at 1 px —
    * a real implementation would re-encode pixels here; the metadata
    * arithmetic and column plumbing are the real part.
    */
  def resizeStub(meta: DataFrame, factor: Int): DataFrame =
    meta
      .withColumn("width", greatest(col("width").cast("int") / lit(1 << factor), lit(1)).cast("int"))
      .withColumn("height", greatest(col("height").cast("int") / lit(1 << factor), lit(1)).cast("int"))

  /** Frame sampling: pick every `stride`-th frame index from n_frames —
    * array arithmetic only, no decode.
    */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.withColumn(
      "sampled_frames",
      when(col("n_frames") > 0, sequence(lit(0), col("n_frames") - 1, lit(stride)))
        .otherwise(array().cast("array<int>")))
}
