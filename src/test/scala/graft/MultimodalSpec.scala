package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.synthesize(spark, 120).cache()

  test("binary payloads round-trip through parquet bit-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 120)
    val a = media.select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val b = back.select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(a == b)
  }

  test("decode stub parses headers consistent with the metadata struct") {
    val decoded = Multimodal.decodeStub(spark, media)
      .withColumnRenamed("kind", "decoded_kind")
    assert(decoded.count() == 120)
    val joined = decoded.join(media, "media_id")
    // kinds agree between payload header and catalog metadata
    assert(joined.filter(col("decoded_kind") =!= col("kind")).count() == 0)
    // image dims in header match meta.width/height
    val badImages = joined.filter(col("kind") === "image" &&
      (col("dim_a") =!= col("meta.width") || col("dim_b") =!= col("meta.height")))
    assert(badImages.count() == 0)
    // checksums are deterministic across two runs
    val c1 = Multimodal.decodeStub(spark, media).select("media_id", "checksum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c2 = Multimodal.decodeStub(spark, media).select("media_id", "checksum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c1 == c2)
  }

  test("metadata struct is prunable: reading meta.width scans only it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media2").toString
    media.write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir).select("media_id", "meta.width")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("payload"),
      s"payload must not be scanned for a metadata projection:\n$plan")
  }

  test("nibble histogram sums to content nibble count") {
    val h = Multimodal.byteHistogram(media)
      .select(col("media_id"), expr("aggregate(hist16, 0, (a, b) -> a + b)").as("total"))
      .join(media.select(col("media_id"),
        ((octet_length(col("payload")) - 16) * 2).as("expect")), "media_id")
    assert(h.filter(col("total") =!= col("expect")).count() == 0)
  }

  test("resize stub caps dims preserving aspect ratio and header parses back") {
    val resized = Multimodal.resizeStub(spark, media, maxSide = 20)
    assert(resized.count() > 0)
    resized.collect().foreach { r =>
      val nw = r.getInt(2); val nh = r.getInt(3)
      assert(math.max(nw, nh) <= 20 && nw >= 1 && nh >= 1)
      // the rewritten header must carry the new dims
      val bb = java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](1))
      assert(bb.getInt(5) == nw && bb.getInt(9) == nh)
    }
    // aspect ratio preserved within integer rounding for one sample
    val before = media.filter(col("kind") === "image")
      .select("media_id", "meta.width", "meta.height").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    resized.collect().foreach { r =>
      val (w, h) = before(r.getLong(0))
      val scale = math.min(1.0, 20.0 / math.max(w, h))
      assert(r.getInt(2) == math.max(1, (w * scale).toInt))
      assert(r.getInt(3) == math.max(1, (h * scale).toInt))
    }
  }

  private lazy val images = Multimodal.synthesizeImages(spark, 60).cache()

  test("real PNG decode recovers actual pixel dimensions") {
    val decoded = Multimodal.decodeImage(spark, images)
    assert(decoded.count() == 60)
    val dims = decoded.select("media_id", "width", "height").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val expect = images.select("media_id", "meta.width", "meta.height").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(dims == expect)
    // luminance is a real pixel statistic: strictly inside (0, 255) for
    // xorshift noise, and deterministic across runs
    val lum1 = Multimodal.decodeImage(spark, images)
      .select("media_id", "mean_luminance").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    lum1.values.foreach(l => assert(l > 0.0 && l < 255.0))
    val lum2 = Multimodal.decodeImage(spark, images)
      .select("media_id", "mean_luminance").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lum1 == lum2)
  }

  test("real PNG resize re-encodes payloads that decode to the new dims") {
    val resized = Multimodal.resizeImage(spark, images, maxSide = 12)
    assert(resized.count() == 60)
    // every resized payload is a REAL PNG: decode it again and the
    // raster must carry the capped dimensions
    val roundTrip = Multimodal.decodeImage(
      spark, resized.select(col("media_id"), col("payload")))
      .select("media_id", "width", "height").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val declared = resized.select("media_id", "new_width", "new_height").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(roundTrip == declared)
    val before = images.select("media_id", "meta.width", "meta.height").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    declared.foreach { case (id, (nw, nh)) =>
      val (w, h) = before(id)
      assert(math.max(nw, nh) <= 12 && nw >= 1 && nh >= 1)
      val scale = math.min(1.0, 12.0 / math.max(w, h))
      assert(nw == math.max(1, (w * scale).toInt))
      assert(nh == math.max(1, (h * scale).toInt))
    }
  }

  private lazy val audio = Multimodal.synthesizeAudio(spark, 60).cache()

  test("real WAV decode recovers rate, frame count, and a sane RMS") {
    val decoded = Multimodal.decodeAudio(spark, audio)
    assert(decoded.count() == 60)
    val got = decoded.select("media_id", "sample_rate", "n_frames", "rms")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    val meta = audio.select("media_id", "meta.sample_rate", "meta.n_samples")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    got.foreach { case (id, (rate, frames, rms)) =>
      assert((rate, frames) == meta(id), s"audio $id header/meta drift")
      // a 12000-amplitude sine has RMS ≈ 12000/√2 ≈ 8485; dither is ±64
      assert(rms > 7000 && rms < 10000, s"audio $id rms $rms out of band")
    }
    // deterministic across runs
    val again = Multimodal.decodeAudio(spark, audio)
      .select("media_id", "rms").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.map { case (k, v) => k -> v._3 } == again)
  }

  test("real WAV resample decimates frames and re-encodes a decodable file") {
    val resampled = Multimodal.resampleAudio(spark, audio, factor = 2)
    assert(resampled.count() == 60)
    // every resampled payload is a REAL WAV: decode again, rates and
    // frame counts must match the declared decimation
    val roundTrip = Multimodal.decodeAudio(
      spark, resampled.select(col("media_id"), col("payload")))
      .select("media_id", "sample_rate", "n_frames").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val before = audio.select("media_id", "meta.n_samples").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    roundTrip.foreach { case (id, (rate, frames)) =>
      assert(rate == 4000, s"audio $id rate $rate != 4000")
      assert(frames == (before(id) + 1) / 2, s"audio $id frame count")
    }
  }

  test("frame sampling picks every k-th frame of video payloads") {
    val sampled = Multimodal.sampleFrames(media, 5).collect()
    assert(sampled.nonEmpty)
    sampled.foreach { r =>
      val n = r.getInt(1)
      val frames = r.getSeq[Int](2)
      assert(frames == (0 until n).filter(_ % 5 == 0))
    }
  }

  test("image aHash dedup finds exact and exposure-shifted dups, no random pairs") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val imgs = Multimodal.synthesizeImages(spark, 40)
    val base = imgs.filter(org.apache.spark.sql.functions.col("media_id") === 7L)
      .select("payload").head().getAs[Array[Byte]](0)
    // exposure-shifted copy: +24 brightness per channel (clamped) —
    // aHash bits are relative to the thumbnail mean, so the hash must
    // survive the shift (the re-exposed re-crawl case)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    val bright = new java.awt.image.BufferedImage(
      img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      def c(v: Int) = math.min(255, v + 24)
      bright.setRGB(x, y, (c((rgb >> 16) & 0xff) << 16)
        | (c((rgb >> 8) & 0xff) << 8) | c(rgb & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bright, "png", bos)
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val extra = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1007L, base),          // exact byte duplicate of 7
        Row(2007L, bos.toByteArray)), // exposure-shifted near-dup of 7
      schema)
    val all = imgs.select("media_id", "payload").unionByName(extra)
    val pairs = Multimodal.dedupImages(spark, all).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    // the exact duplicate collides at Hamming 0
    assert(pairs.exists { case (a, b, h) => a == 7L && b == 1007L && h == 0L },
      pairs.mkString(", "))
    // the exposure shift stays within the near-dup cut
    assert(pairs.exists { case (a, b, h) => a == 7L && b == 2007L && h <= 3L },
      pairs.mkString(", "))
    // distinct random images never collide: every reported pair
    // involves doc 7's family
    val fam = Set(7L, 1007L, 2007L)
    assert(pairs.forall { case (a, b, _) => fam(a) && fam(b) },
      pairs.mkString(", "))
  }

  test("audio fingerprint dedup finds exact and re-leveled dups, no random pairs") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val clips = Multimodal.synthesizeAudio(spark, 30)
    val base = clips.filter(org.apache.spark.sql.functions.col("media_id") === 4L)
      .select("payload").head().getAs[Array[Byte]](0)
    // volume-halved copy: every PCM sample scaled by 0.5 — envelope
    // bits are relative to the clip mean, so the fingerprint must
    // survive the gain change (the re-leveled re-crawl case)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(base))
    val fmt = ais.getFormat
    val bytes = ais.readAllBytes()
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = java.nio.ByteBuffer.allocate(bytes.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until bytes.length / 2).foreach { i =>
      out.putShort((bb.getShort(i * 2) / 2).toShort)
    }
    val quiet = {
      val ais2 = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(out.array()), fmt,
        (bytes.length / 2).toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais2, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val extra = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1004L, base),   // exact byte duplicate of 4
        Row(2004L, quiet)), // re-leveled near-dup of 4
      schema)
    val all = clips.select("media_id", "payload").unionByName(extra)
    val pairs = Multimodal.dedupAudio(spark, all).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    assert(pairs.exists { case (a, b, h) => a == 4L && b == 1004L && h == 0L },
      pairs.mkString(", "))
    assert(pairs.exists { case (a, b, h) => a == 4L && b == 2004L && h <= 3L },
      pairs.mkString(", "))
    val fam = Set(4L, 1004L, 2004L)
    assert(pairs.forall { case (a, b, _) => fam(a) && fam(b) },
      pairs.mkString(", "))
  }
}
