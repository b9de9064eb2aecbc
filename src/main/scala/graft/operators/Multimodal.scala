package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a batched per-partition
  * feature-extraction pipeline.
  *
  * Decode strategy: payloads carrying a real image signature (PNG / JPEG /
  * GIF / BMP magic bytes) are decoded with the JDK's built-in
  * `javax.imageio` — real dimensions, real luminance features, zero extra
  * dependencies ([[ImageCodec]]); RIFF/WAVE audio headers are parsed for
  * real by [[AudioCodec]]'s chunk walk (channels, sample rate, bit
  * depth, frames, duration — q119-oracled). Everything else (compressed
  * audio, video, and any byte stream ImageIO rejects) falls back to
  * [[FakeDecoder]], the deterministic pseudo-decoder standing in for
  * codecs this environment lacks. The Spark side is identical either way and is what
  * matters at 100 TB — the schema contract, the `mapPartitions` batch
  * shape (decoder state initialized once per partition, rows streamed
  * through it), and the fact that payload bytes never shuffle: features
  * are extracted in the scan stage and only (id, metadata, features)
  * move on.
  */
object Multimodal {

  /** Metadata struct carried alongside every binary payload. */
  val metadataType: StructType = StructType(Seq(
    StructField("size_bytes", LongType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("size_bytes", LongType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("feature", ArrayType(DoubleType))))

  /** STUB decoder — stands in for a real image/audio codec binding.
    * Deterministic: dimensions and features are pure functions of the
    * payload bytes, so tests and reruns agree. A production build replaces
    * exactly this object (same signatures) with e.g. a JNI codec.
    */
  object FakeDecoder {
    def dimensions(bytes: Array[Byte]): (Int, Int) = {
      val h = bytes.foldLeft(17L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000003)
      (64 + (h % 193).toInt, 64 + ((h / 193) % 129).toInt)
    }
    def meanByte(bytes: Array[Byte]): Double =
      if (bytes.isEmpty) 0.0
      else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
    /** 8-dim "embedding": byte-value histogram over 8 buckets, normalized. */
    def features(bytes: Array[Byte]): Array[Double] = {
      val hist = new Array[Double](8)
      bytes.foreach(b => hist((b & 0xff) / 32) += 1.0)
      val n = math.max(bytes.length, 1)
      hist.map(_ / n)
    }

    /** 60-bit average-hash over the byte stream — the non-image stand-in
      * for [[ImageCodec.aHash]]: bit i set iff the byte sampled at
      * position ⌊n·i/60⌋ is at or above the payload's mean byte.
      * Locality-preserving (small payload edits flip few bits) and
      * mirrored 1:1 by the DuckDB oracle over ascii codes (60 bits keeps
      * every band chunk below the BIGINT sign bit — see
      * [[Dedup.hammingPairs]]).
      */
    def byteAHash(bytes: Array[Byte]): Long = {
      val n = bytes.length
      if (n == 0) 0L
      else {
        var sum = 0L; var j = 0
        while (j < n) { sum += (bytes(j) & 0xff); j += 1 }
        val mu = sum.toDouble / n
        var ph = 0L; var i = 0
        while (i < 60) {
          if ((bytes(((n.toLong * i) / 60).toInt) & 0xff) >= mu) ph |= (1L << i)
          i += 1
        }
        ph
      }
    }
  }

  /** Real image decode on the JDK's built-in `javax.imageio` — no new
    * dependencies. Only consulted for payloads whose leading bytes carry a
    * known image signature, so non-image payloads never pay a decode
    * attempt. Luminance features use the same 8-bucket-histogram contract
    * as [[FakeDecoder.features]] (pixel luma 0-255 instead of raw bytes).
    */
  object ImageCodec {
    def looksLikeImage(bytes: Array[Byte]): Boolean =
      bytes.length >= 4 && (
        (bytes(0) == 0x89.toByte && bytes(1) == 'P'.toByte &&
          bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte) ||
        (bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte &&
          bytes(2) == 0xFF.toByte) ||
        (bytes(0) == 'G'.toByte && bytes(1) == 'I'.toByte && bytes(2) == 'F'.toByte) ||
        (bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte))

    def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }

    private def lumas(im: java.awt.image.BufferedImage): Iterator[Int] =
      for (y <- (0 until im.getHeight).iterator; x <- 0 until im.getWidth) yield {
        val rgb = im.getRGB(x, y)
        (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
      }

    def meanLuma(im: java.awt.image.BufferedImage): Double = {
      val n = im.getWidth.toLong * im.getHeight
      if (n == 0) 0.0 else lumas(im).foldLeft(0L)(_ + _).toDouble / n
    }

    /** 8-dim luminance histogram, normalized — mirrors FakeDecoder's shape. */
    def features(im: java.awt.image.BufferedImage): Array[Double] = {
      val hist = new Array[Double](8)
      lumas(im).foreach(l => hist(l / 32) += 1.0)
      val n = math.max(im.getWidth.toLong * im.getHeight, 1L)
      hist.map(_ / n)
    }

    /** 60-bit perceptual average-hash (aHash): bilinear-scale to a 10×6
      * luma grid, bit per cell set iff the cell is at or above the grid
      * mean. The standard near-dup image signature — robust to resize,
      * re-encode and small edits; Hamming distance between hashes tracks
      * visual difference. 60 bits (not the classic 64) so the banded
      * pairing arithmetic ([[Dedup.hammingPairs]]) never touches the
      * sign bit.
      */
    def aHash(im: java.awt.image.BufferedImage): Long = {
      val out = new java.awt.image.BufferedImage(10, 6,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(im, 0, 0, 10, 6, null)
      } finally g.dispose()
      val ls = lumas(out).toArray
      val mu = ls.foldLeft(0L)(_ + _).toDouble / ls.length
      ls.zipWithIndex.foldLeft(0L) { case (acc, (l, i)) =>
        if (l >= mu) acc | (1L << i) else acc
      }
    }

    /** Decode → smooth-scale → re-encode PNG. */
    def resize(bytes: Array[Byte], width: Int, height: Int): Option[Array[Byte]] =
      decode(bytes).map { im =>
        val out = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(im, 0, 0, width, height, null)
        } finally g.dispose()
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", buf)
        buf.toByteArray
      }
  }

  /** Real audio header parsing for RIFF/WAVE payloads — pure JDK byte
    * walking, no codec dependency. WAV is the one audio container whose
    * metadata (channels, sample rate, bit depth, frame count, duration)
    * is fully recoverable from a header walk; compressed codecs
    * (MP3/AAC/...) stay out of scope in this environment and fall to
    * the [[FakeDecoder]] path, exactly like video.
    *
    * Chunk walk, not fixed offsets: real WAV files carry LIST/INFO/fact
    * chunks between `fmt ` and `data`, so the parser scans the chunk
    * directory (word-aligned sizes per the RIFF spec) and clamps the
    * declared data size to the bytes actually present (truncated files
    * report the frames they physically contain).
    */
  object AudioCodec {
    final case class WavInfo(channels: Int, sampleRate: Int,
        bitsPerSample: Int, nFrames: Long, durationMs: Long)

    def looksLikeWav(bytes: Array[Byte]): Boolean =
      bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

    def parseWav(bytes: Array[Byte]): Option[WavInfo] = {
      if (!looksLikeWav(bytes)) return None
      var pos = 12
      var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
      var dataLen: Option[Long] = None
      while (pos + 8 <= bytes.length && (fmt.isEmpty || dataLen.isEmpty)) {
        val id = new String(bytes, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = u32(bytes, pos + 4)
        if (id == "fmt " && pos + 8 + 16 <= bytes.length)
          fmt = Some((u16(bytes, pos + 10), u32(bytes, pos + 12).toInt,
            u16(bytes, pos + 22)))
        else if (id == "data")
          // clamp to physically-present bytes: a truncated file reports
          // the frames it holds, not the frames its header promises
          dataLen = Some(math.min(size, (bytes.length - pos - 8).toLong))
        pos += 8 + size.toInt + (size.toInt & 1) // RIFF chunks word-align
      }
      for {
        (ch, rate, bits) <- fmt
        dl <- dataLen
        if ch > 0 && rate > 0 && bits > 0 && (ch.toLong * bits % 8 == 0)
      } yield {
        val blockAlign = ch.toLong * bits / 8
        val frames = if (blockAlign > 0) dl / blockAlign else 0L
        WavInfo(ch, rate, bits, frames, frames * 1000L / rate)
      }
    }

    /** Serialize a canonical 16-bit PCM WAV: 44-byte header + samples.
      * The synthesis half of the round-trip contract — [[parseWav]] must
      * recover exactly the parameters written here.
      */
    def buildWav(channels: Int, sampleRate: Int, data: Array[Byte]): Array[Byte] = {
      require(channels > 0 && sampleRate > 0)
      val block = channels * 2
      val dl = data.length / block * block // whole frames only
      val out = java.nio.ByteBuffer.allocate(44 + dl)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes); out.putInt(36 + dl); out.put("WAVE".getBytes)
      out.put("fmt ".getBytes); out.putInt(16)
      out.putShort(1.toShort) // PCM
      out.putShort(channels.toShort)
      out.putInt(sampleRate)
      out.putInt(sampleRate * block) // byte rate
      out.putShort(block.toShort)
      out.putShort(16.toShort) // bits per sample
      out.put("data".getBytes); out.putInt(dl)
      out.put(data, 0, dl)
      out.array()
    }

    // ----------------------------------------------------------------
    // MP3 (MPEG-1 Layer III) frame headers — pure JDK bit math
    // ----------------------------------------------------------------

    final case class Mp3Info(bitrateKbps: Int, sampleRate: Int,
        nFrames: Long, durationMs: Long)

    /** ISO/IEC 11172-3 Layer III tables: bitrate index → kbps (0 =
      * free/bad, unsupported), sample-rate index → Hz.
      */
    private val Mp3Bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96,
      112, 128, 160, 192, 224, 256, 320, 0)
    private val Mp3Rates = Array(44100, 48000, 32000, 0)

    /** First-frame-sync predicate: 11-bit sync + MPEG-1 (version bits
      * 11) + Layer III (01); CRC-protected and unprotected both match.
      */
    private def mp3Sync(b: Array[Byte], o: Int): Boolean =
      (b(o) & 0xff) == 0xff && (b(o + 1) & 0xfe) == 0xfa

    /** Parse an MPEG-1 Layer III stream: scan to the first frame sync
      * (ID3v2 prefixes and junk are skipped byte-wise), then walk
      * frames by their computed length `⌊144000·kbps/Hz⌋ + padding`.
      * A truncated final frame is NOT counted (the physical-bytes
      * honesty rule [[parseWav]] follows). Reported bitrate is the
      * FIRST frame's (VBR streams exist; the first-frame figure is the
      * documented convention here). Duration = frames·1152 samples at
      * the stream rate, floored to ms. MPEG-2/2.5 and Layers I/II
      * return None — documented scope, not silent wrongness.
      *
      * A mid-stream invalid header (free/bad bitrate, reserved rate
      * index — or trailing bytes that merely alias a sync pattern)
      * STOPS the walk but KEEPS the frames already counted, the same
      * rule a truncated final frame gets: one corrupt tail must not
      * discard hundreds of valid parsed frames. Only a stream whose
      * FIRST synced frame is invalid returns None.
      */
    def parseMp3(bytes: Array[Byte]): Option[Mp3Info] = {
      var off = 0
      while (off + 4 <= bytes.length && !mp3Sync(bytes, off)) off += 1
      var frames = 0L
      var kbps0 = -1
      var rate0 = -1
      var pos = off
      var ok = true
      while (ok && pos + 4 <= bytes.length && mp3Sync(bytes, pos)) {
        val bIdx = (bytes(pos + 2) & 0xf0) >>> 4
        val rIdx = (bytes(pos + 2) & 0x0c) >>> 2
        val pad = (bytes(pos + 2) & 0x02) >>> 1
        val kbps = Mp3Bitrates(bIdx)
        val hz = Mp3Rates(rIdx)
        if (kbps == 0 || hz == 0) ok = false // free-format unsupported
        else {
          if (kbps0 == -1) { kbps0 = kbps; rate0 = hz }
          val flen = 144000 * kbps / hz + pad
          if (pos + flen > bytes.length) pos = bytes.length // truncated
          else { frames += 1; pos += flen }
        }
      }
      if (frames == 0) None
      else Some(Mp3Info(kbps0, rate0, frames,
        frames * 1152L * 1000L / rate0))
    }

    /** Serialize `nFrames` unpadded MPEG-1 Layer III frames (header +
      * zero payload) — the synthesis half of the round-trip contract.
      */
    def buildMp3(bitrateKbps: Int, sampleRate: Int,
        nFrames: Int): Array[Byte] = {
      val bIdx = Mp3Bitrates.indexOf(bitrateKbps)
      val rIdx = Mp3Rates.indexOf(sampleRate)
      require(bIdx > 0 && rIdx >= 0 && rIdx < 3 && nFrames > 0,
        s"unsupported MP3 parameters: $bitrateKbps kbps @ $sampleRate Hz")
      val flen = 144000 * bitrateKbps / sampleRate
      val out = new Array[Byte](flen * nFrames)
      var f = 0
      while (f < nFrames) {
        val o = f * flen
        out(o) = 0xff.toByte
        out(o + 1) = 0xfb.toByte // MPEG-1, Layer III, no CRC
        out(o + 2) = ((bIdx << 4) | (rIdx << 2)).toByte
        out(o + 3) = 0
        f += 1
      }
      out
    }
  }

  /** Real-WAV payload table from the documents fixture: each doc's text
    * bytes become PCM sample data inside a genuine RIFF/WAVE container,
    * with channels/sample-rate varied deterministically by doc_id — so
    * [[audioMetadata]]'s parser is exercised against files whose true
    * parameters an oracle can compute in closed form from
    * (doc_id, byte length) alone.
    */
  def synthesizeWavPayloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val rdd = graft.util.Parallelism.ensure(docs)
      .select("doc_id", "text").rdd.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val channels = 1 + (id % 2).toInt
          val rate = 8000 + (id % 3).toInt * 4000
          val data = r.getString(1)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          Row(id, AudioCodec.buildWav(channels, rate, data))
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType))))
  }

  /** Per-payload audio metadata via the REAL RIFF walk: `(doc_id,
    * channels, sample_rate, bits_per_sample, n_frames, duration_ms)`;
    * non-WAV or malformed payloads yield null metadata (the honest
    * answer, not a fake). Same mapPartitions scan-stage shape as
    * [[extractFeatures]] — payload bytes never shuffle.
    */
  def audioMetadata(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    val rdd = graft.util.Parallelism.ensure(payloads)
      .select("doc_id", "payload").rdd.mapPartitions { rows =>
        rows.map { r =>
          val info = AudioCodec.parseWav(r.getAs[Array[Byte]](1))
          info match {
            case Some(i) => Row(r.getLong(0), i.channels, i.sampleRate,
              i.bitsPerSample, i.nFrames, i.durationMs)
            case None => Row(r.getLong(0), null, null, null, null, null)
          }
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("bits_per_sample", IntegerType),
      StructField("n_frames", LongType),
      StructField("duration_ms", LongType))))
  }

  /** Real-MP3 payload table: each doc becomes a genuine MPEG-1 Layer
    * III frame stream with bitrate / sample rate / frame count varied
    * deterministically by doc_id, so [[mp3Metadata]]'s walker is
    * checked against closed-form parameters the oracle recomputes from
    * doc_id alone (the [[synthesizeWavPayloads]] contract).
    */
  def synthesizeMp3Payloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val rdd = graft.util.Parallelism.ensure(docs)
      .select("doc_id").rdd.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val kbps = Array(64, 128, 192, 320)((id % 4).toInt)
          val rate = Array(44100, 48000, 32000)((id % 3).toInt)
          val frames = 1 + (id % 5).toInt
          Row(id, AudioCodec.buildMp3(kbps, rate, frames))
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType))))
  }

  /** Per-payload MP3 metadata via the REAL frame walk: (doc_id,
    * bitrate_kbps, sample_rate, n_frames, duration_ms); non-MP3 or
    * unsupported streams yield null metadata. Same scan-stage
    * mapPartitions shape as [[audioMetadata]].
    */
  def mp3Metadata(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    val rdd = graft.util.Parallelism.ensure(payloads)
      .select("doc_id", "payload").rdd.mapPartitions { rows =>
        rows.map { r =>
          AudioCodec.parseMp3(r.getAs[Array[Byte]](1)) match {
            case Some(i) => Row(r.getLong(0), i.bitrateKbps, i.sampleRate,
              i.nFrames, i.durationMs)
            case None => Row(r.getLong(0), null, null, null, null)
          }
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("bitrate_kbps", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", LongType),
      StructField("duration_ms", LongType))))
  }

  /** Build a multimodal table from the documents fixture: text bytes stand
    * in for a media payload; mime is derived from the source column. The
    * schema contract (binary + typed metadata struct) is the real thing.
    */
  def synthesizePayloads(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        length(encode(col("text"), "UTF-8")).cast("long").as("size_bytes"),
        concat(lit("image/"), col("source")).as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height")).as("metadata"))

  /** Batched decode/feature-extract: one decoder per partition, rows
    * streamed. This is the `mapPartitions` shape a real codec needs
    * (expensive init amortized, bounded memory, no payload shuffle).
    */
  def extractFeatures(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    val rdd = graft.util.Parallelism.ensure(payloads)
      .select("doc_id", "payload", "metadata.size_bytes", "metadata.mime")
      .rdd.mapPartitions { rows =>
        // decoder/codec init would happen here, once per partition
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val real =
            if (ImageCodec.looksLikeImage(bytes)) ImageCodec.decode(bytes)
            else None
          real match {
            case Some(im) =>
              Row(id, r.getLong(2), r.getString(3), im.getWidth, im.getHeight,
                ImageCodec.meanLuma(im), ImageCodec.features(im).toSeq)
            case None =>
              val (w, h) = FakeDecoder.dimensions(bytes)
              Row(id, r.getLong(2), r.getString(3), w, h,
                FakeDecoder.meanByte(bytes), FakeDecoder.features(bytes).toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Per-payload 60-bit perceptual hash: real images via
    * [[ImageCodec.aHash]] (decode → 10×6 luma grid → threshold), other
    * payloads via [[FakeDecoder.byteAHash]] (same contract over raw
    * bytes). mapPartitions shape as [[extractFeatures]] — decode cost
    * stays in the scan stage and payloads never shuffle; only (id, hash)
    * rows leave the stage.
    */
  def perceptualHashes(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    val rdd = graft.util.Parallelism.ensure(payloads)
      .select("doc_id", "payload").rdd.mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val ph =
            if (ImageCodec.looksLikeImage(bytes))
              ImageCodec.decode(bytes).map(ImageCodec.aHash)
                .getOrElse(FakeDecoder.byteAHash(bytes))
            else FakeDecoder.byteAHash(bytes)
          Row(r.getLong(0), ph)
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ph", LongType))))
  }

  /** Near-duplicate payload pairs by perceptual hash: banded Hamming
    * pairing ([[Dedup.hammingPairs]]) over [[perceptualHashes]] — the
    * image twin of MinHash-LSH text dedup, with guaranteed recall for
    * `maxHamming < bands` and no all-pairs product.
    */
  def imageNearDups(payloads: DataFrame, maxHamming: Int = 5): DataFrame =
    Dedup.hammingPairs(perceptualHashes(payloads), maxHamming)

  /** Resize: real-image payloads decode → scale → re-encode (PNG) via
    * [[ImageCodec]]; other payloads use the deterministic byte-stream
    * stand-in (truncate/repeat to the area-scaled length) so schema,
    * partition behavior and downstream feature extraction are exercised
    * end to end either way. Runs in the scan stage — payloads never
    * shuffle.
    */
  def resize(payloads: DataFrame, width: Int, height: Int): DataFrame = {
    val spark = payloads.sparkSession
    val rdd = graft.util.Parallelism.ensure(payloads)
      .select("doc_id", "payload", "metadata.mime").rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val real =
            if (ImageCodec.looksLikeImage(bytes))
              ImageCodec.resize(bytes, width, height)
            else None
          val out = real.getOrElse {
            val (w0, h0) = FakeDecoder.dimensions(bytes)
            val target = math.max(1,
              (bytes.length.toLong * (width.toLong * height) / math.max(1L, w0.toLong * h0)).toInt)
            // empty payload (zero-length doc) → empty output, matching
            // meanByte/features' empty handling — indexing bytes(0) would throw
            if (bytes.isEmpty) Array.empty[Byte]
            else Array.tabulate(target)(i => bytes(i % bytes.length))
          }
          Row(r.getLong(0), out, Row(out.length.toLong, r.getString(2),
            width, height))
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType),
      StructField("metadata", metadataType))))
  }

  // ----------------------------------------------------------------
  // MP4 / ISO-BMFF container metadata — pure JDK box walking
  // ----------------------------------------------------------------

  /** ISO/IEC 14496-12 box-structure parsing: the CONTAINER metadata a
    * video pipeline reads before any decode decision (duration, track
    * count, display dimensions) comes from the `moov` box tree and is
    * pure big-endian byte walking — no codec libraries. Frame DECODE
    * stays documented out-of-scope (no codecs in the sandbox); this is
    * the same honesty level as [[AudioCodec]]'s WAV chunk walk and MP3
    * frame-header walk.
    */
  object VideoContainer {

    final case class Mp4Info(timescale: Int, durationTicks: Long,
        durationMs: Long, nTracks: Int, width: Int, height: Int)

    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o + 4, 4, "ISO-8859-1")

    private def put32(b: Array[Byte], o: Int, v: Long): Unit = {
      b(o) = ((v >>> 24) & 0xff).toByte; b(o + 1) = ((v >>> 16) & 0xff).toByte
      b(o + 2) = ((v >>> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
    }

    private def putType(b: Array[Byte], o: Int, t: String): Unit =
      t.getBytes("ISO-8859-1").copyToArray(b, o + 4)

    /** Parse an ISO-BMFF stream: the file must LEAD with `ftyp`
      * (the brand gate — a WAV or MP3 never passes), then top-level
      * boxes walk by their 32-bit sizes to `moov`; inside it `mvhd`
      * yields timescale/duration, `trak` children count tracks, and
      * the FIRST `tkhd` carries the 16.16-fixed display dimensions.
      * A truncated or invalid box mid-walk STOPS the walk and keeps
      * what parsed (the [[AudioCodec.parseMp3]] rule); None only when
      * `ftyp` or a complete `moov`+`mvhd` never materializes.
      * 64-bit (`size == 1`) and to-end (`size == 0`) boxes are
      * unsupported scope, treated as walk-stopping.
      */
    def parseMp4(bytes: Array[Byte]): Option[Mp4Info] = {
      if (bytes.length < 16 || fourcc(bytes, 0) != "ftyp") return None
      var off = 0
      var moovAt = -1L
      var moovSize = 0L
      var ok = true
      while (ok && moovAt < 0 && off + 8 <= bytes.length) {
        val size = be32(bytes, off)
        val typ = fourcc(bytes, off)
        if (size < 8 || off + size > bytes.length) ok = false
        else if (typ == "moov") { moovAt = off; moovSize = size }
        else off += size.toInt
      }
      if (moovAt < 0) return None
      var timescale = -1
      var durTicks = -1L
      var nTracks = 0
      var width = -1
      var height = -1
      var p = moovAt.toInt + 8
      val moovEnd = (moovAt + moovSize).toInt
      var walk = true
      while (walk && p + 8 <= moovEnd) {
        val size = be32(bytes, p)
        val typ = fourcc(bytes, p)
        if (size < 8 || p + size > moovEnd) walk = false
        else {
          if (typ == "mvhd" && size >= 32 && bytes(p + 8) == 0) {
            // version 0: timescale at +20, duration at +24
            timescale = be32(bytes, p + 20).toInt
            durTicks = be32(bytes, p + 24)
          } else if (typ == "trak") {
            nTracks += 1
            // first tkhd provides width/height (16.16 fixed, v0: at
            // +84 and +88 of the tkhd box)
            var q = p + 8
            val trakEnd = p + size.toInt
            var inner = true
            while (inner && q + 8 <= trakEnd) {
              val s2 = be32(bytes, q)
              if (s2 < 8 || q + s2 > trakEnd) inner = false
              else {
                if (fourcc(bytes, q) == "tkhd" && s2 >= 92 &&
                    bytes(q + 8) == 0 && width < 0) {
                  width = (be32(bytes, q + 84) >>> 16).toInt
                  height = (be32(bytes, q + 88) >>> 16).toInt
                }
                q += s2.toInt
              }
            }
          }
          p += size.toInt
        }
      }
      if (timescale <= 0 || durTicks < 0) None
      else Some(Mp4Info(timescale, durTicks,
        durTicks * 1000L / timescale, nTracks,
        math.max(width, 0), math.max(height, 0)))
    }

    /** Serialize a minimal ISO-BMFF file: ftyp + moov(mvhd v0 +
      * nTracks × trak(tkhd v0)) + an empty-payload mdat — the
      * synthesis half of the round-trip contract.
      */
    def buildMp4(timescale: Int, durationTicks: Long, nTracks: Int,
        width: Int, height: Int): Array[Byte] = {
      require(timescale > 0 && durationTicks >= 0 && nTracks >= 1 &&
        width >= 0 && height >= 0, "invalid MP4 parameters")
      val ftyp = new Array[Byte](24)
      put32(ftyp, 0, 24); putType(ftyp, 0, "ftyp")
      "isom".getBytes("ISO-8859-1").copyToArray(ftyp, 8)
      put32(ftyp, 12, 512)
      "isom".getBytes("ISO-8859-1").copyToArray(ftyp, 16)
      "mp42".getBytes("ISO-8859-1").copyToArray(ftyp, 20)
      val mvhd = new Array[Byte](108)
      put32(mvhd, 0, 108); putType(mvhd, 0, "mvhd")
      put32(mvhd, 20, timescale.toLong)
      put32(mvhd, 24, durationTicks)
      put32(mvhd, 28, 0x00010000L) // rate 1.0
      mvhd(32) = 0x01; mvhd(33) = 0x00 // volume 1.0
      // identity matrix at +44 (36 bytes)
      put32(mvhd, 44, 0x00010000L); put32(mvhd, 60, 0x00010000L)
      put32(mvhd, 76, 0x40000000L)
      put32(mvhd, 104, nTracks + 1L) // next_track_id
      val traks = (1 to nTracks).map { tid =>
        val tkhd = new Array[Byte](92)
        put32(tkhd, 0, 92); putType(tkhd, 0, "tkhd")
        tkhd(11) = 0x07 // flags: enabled | in-movie | in-preview
        put32(tkhd, 20, tid.toLong)
        put32(tkhd, 28, durationTicks)
        put32(tkhd, 48, 0x00010000L); put32(tkhd, 64, 0x00010000L)
        put32(tkhd, 80, 0x40000000L)
        put32(tkhd, 84, width.toLong << 16)
        put32(tkhd, 88, height.toLong << 16)
        val trak = new Array[Byte](8 + 92)
        put32(trak, 0, trak.length.toLong); putType(trak, 0, "trak")
        tkhd.copyToArray(trak, 8)
        trak
      }
      val moov = new Array[Byte](8 + 108 + traks.map(_.length).sum)
      put32(moov, 0, moov.length.toLong); putType(moov, 0, "moov")
      mvhd.copyToArray(moov, 8)
      traks.foldLeft(116) { (o, t) => t.copyToArray(moov, o); o + t.length }
      val mdat = new Array[Byte](8)
      put32(mdat, 0, 8); putType(mdat, 0, "mdat")
      ftyp ++ moov ++ mdat
    }
  }

  /** Deterministic MP4 payload table from the documents fixture —
    * parameters derive from doc_id alone so the SQL oracle recomputes
    * the expected metadata without parsing bytes (the
    * [[synthesizeMp3Payloads]] convention).
    */
  def synthesizeMp4Payloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val rdd = graft.util.Parallelism.ensure(docs)
      .select("doc_id").rdd.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val timescale = Array(600, 1000, 90000)((id % 3).toInt)
          val secs = 1 + (id % 7)
          val nTracks = 1 + (id % 2).toInt
          val dim = 16 * (id % 4).toInt
          Row(id, VideoContainer.buildMp4(timescale,
            secs * timescale.toLong, nTracks, 320 + dim, 240 + dim))
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType))))
  }

  /** Per-payload MP4 container metadata via the REAL box walk:
    * (doc_id, timescale, duration_ms, n_tracks, width, height);
    * non-BMFF payloads yield null metadata.
    */
  def mp4Metadata(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    val rdd = graft.util.Parallelism.ensure(payloads)
      .select("doc_id", "payload").rdd.mapPartitions { rows =>
        rows.map { r =>
          VideoContainer.parseMp4(r.getAs[Array[Byte]](1)) match {
            case Some(i) => Row(r.getLong(0), i.timescale, i.durationMs,
              i.nTracks, i.width, i.height)
            case None => Row(r.getLong(0), null, null, null, null, null)
          }
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("timescale", IntegerType),
      StructField("duration_ms", LongType),
      StructField("n_tracks", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))
  }

  /** STUB frame sampling for video-like payloads: every payload splits
    * into `n` evenly-spaced byte windows ("frames"), one output row each —
    * the explode-shaped plumbing a real frame sampler needs (row count
    * multiplies in the scan stage, frame payloads stay columnar).
    */
  def sampleFrames(payloads: DataFrame, n: Int, frameBytes: Int = 64): DataFrame = {
    val spark = payloads.sparkSession
    val rdd = graft.util.Parallelism.ensure(payloads)
      .select("doc_id", "payload").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes.isEmpty) Iterator.empty
        else (0 until n).iterator.map { i =>
          val start = (bytes.length.toLong * i / n).toInt
          val frame = bytes.slice(start, math.min(bytes.length, start + frameBytes))
          Row(r.getLong(0), i, frame, FakeDecoder.meanByte(frame))
        }
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType),
      StructField("frame_mean_byte", DoubleType))))
  }

  /** Per-mime rollup of extracted features — the profiling hook that makes
    * multimodal columns first-class in the monitor pipeline.
    */
  def featureSummary(features: DataFrame): DataFrame =
    features.groupBy("mime")
      .agg(
        count(lit(1)).as("n_items"),
        sum("size_bytes").as("total_bytes"),
        round(avg("mean_byte"), 4).as("avg_mean_byte"),
        round(avg("width"), 4).as("avg_width"),
        round(avg("height"), 4).as("avg_height"))
      .orderBy("mime")
}
