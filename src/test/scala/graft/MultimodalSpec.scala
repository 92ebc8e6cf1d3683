package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.BinaryFiles

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def binDir(): String = {
    val dir = Fixtures.tmpDir("bin")
    Files.write(dir.resolve("a.img"), Array[Byte](1, 2, 3, 4, 5))
    Files.write(dir.resolve("b.wav"), "audio-ish bytes".getBytes)
    dir.toString
  }

  test("binaryFile read produces media rows with type from extension") {
    val df = Multimodal.readBinaryDir(spark, binDir())
    val rows = df.orderBy("media_type").collect()
    assert(rows.map(_.getAs[String]("media_type")).toSeq == Seq("img", "wav"))
    assert(rows.forall(_.getAs[Array[Byte]]("payload").nonEmpty))
  }

  test("stub decode is deterministic and shape-correct") {
    val df = Multimodal.readBinaryDir(spark, binDir())
      .withColumn("meta", Multimodal.decodeImageMeta(col("payload")))
      .withColumn("features", Multimodal.extractFeatures(col("payload")))
    val r = df.filter(col("media_type") === "img").collect()(0)
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[Int]("width") >= 1 && meta.getAs[Int]("width") <= 3840)
    assert(meta.getAs[Int]("height") >= 1 && meta.getAs[Int]("height") <= 2160)
    assert(meta.getAs[String]("codec") == "stub")
    val feats = r.getSeq[Double](r.fieldIndex("features"))
    assert(feats.size == 8 && feats.forall(f => f >= 0.0 && f < 1.0))
    // deterministic: same payload → same features
    val again = Multimodal.readBinaryDir(spark, binDir())
      .withColumn("features", Multimodal.extractFeatures(col("payload")))
      .filter(col("media_type") === "img").collect()(0)
    assert(again.getSeq[Double](again.fieldIndex("features")) == feats)
  }

  test("real JDK decode reads true dimensions from generated PNG and BMP") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff00ff) // non-trivial pixel so encoders emit data
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, out), s"JDK has no $fmt writer")
      out.toByteArray
    }
    val dir = Fixtures.tmpDir("imgs")
    Files.write(dir.resolve("a.png"), imageBytes("png", 123, 45))
    Files.write(dir.resolve("b.bmp"), imageBytes("bmp", 7, 9))
    Files.write(dir.resolve("c.wav"), "not an image".getBytes)
    val decoded = Multimodal.decodeImageMetaJvm(
      Multimodal.readBinaryDir(spark, dir.toString))
    val byType = decoded.collect()
      .map(r => r.getAs[String]("media_type") -> r.getAs[org.apache.spark.sql.Row]("meta"))
      .toMap
    assert(byType("png").getAs[Int]("width") == 123)
    assert(byType("png").getAs[Int]("height") == 45)
    assert(byType("png").getAs[String]("codec") == "png")
    assert(byType("bmp").getAs[Int]("width") == 7)
    assert(byType("bmp").getAs[Int]("height") == 9)
    assert(byType("wav") == null) // unrecognized bytes → null meta
  }

  test("REAL pixel content decode: exact channel sums for PNG/BMP/GIF; corrupt → null") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def twoPixel(fmt: String): Array[Byte] = {
      val img = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff0000) // pure red
      img.setRGB(1, 0, 0x0000ff) // pure blue
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, out), s"JDK has no $fmt writer")
      out.toByteArray
    }
    val dir = Fixtures.tmpDir("pix")
    Files.write(dir.resolve("a.png"), twoPixel("png"))
    Files.write(dir.resolve("b.bmp"), twoPixel("bmp"))
    Files.write(dir.resolve("c.gif"), twoPixel("gif"))
    Files.write(dir.resolve("d.bin"), "definitely not pixels".getBytes)
    val decoded = Multimodal.decodeImageContentJvm(
      Multimodal.readBinaryDir(spark, dir.toString))
    val byType = decoded.collect()
      .map(r => r.getAs[String]("media_type") ->
        r.getAs[org.apache.spark.sql.Row]("content")).toMap
    for (fmt <- Seq("png", "bmp", "gif")) {
      val c = byType(fmt)
      assert(c != null, s"$fmt must decode")
      assert((c.getAs[Int]("width"), c.getAs[Int]("height"),
        c.getAs[Long]("n_pixels")) == ((2, 1, 2L)), s"$fmt: $c")
      // lossless round-trip: exactly one full-red and one full-blue pixel
      assert((c.getAs[Long]("sum_r"), c.getAs[Long]("sum_g"),
        c.getAs[Long]("sum_b")) == ((255L, 0L, 255L)), s"$fmt sums: $c")
    }
    assert(byType("bin") == null, "unrecognized bytes → null content")
  }

  test("real WAV/MP4 header decode reads true durations; corrupt bytes degrade to null") {
    import java.io.ByteArrayOutputStream
    import java.nio.{ByteBuffer, ByteOrder}
    // a REAL wav via the JDK's own audio writer: 1s of 8kHz 16-bit mono
    def wavBytes(seconds: Int, rate: Float = 8000f): Array[Byte] = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val n = (rate * seconds).toInt
      val pcm = new java.io.ByteArrayInputStream(new Array[Byte](n * 2))
      val ais = new AudioInputStream(pcm, fmt, n.toLong)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // a minimal MP4: ftyp box + moov{mvhd v0 timescale=600 duration=1500} → 2500ms
    def mp4Bytes(timescale: Int, duration: Int): Array[Byte] = {
      def box(tp: String, body: Array[Byte]): Array[Byte] = {
        val bb = ByteBuffer.allocate(8 + body.length).order(ByteOrder.BIG_ENDIAN)
        bb.putInt(8 + body.length).put(tp.getBytes("US-ASCII")).put(body)
        bb.array()
      }
      val mvhd = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
      mvhd.putInt(0)          // version 0 + flags
      mvhd.putInt(0).putInt(0) // creation, modification
      mvhd.putInt(timescale).putInt(duration)
      box("ftyp", "isom".getBytes ++ new Array[Byte](4)) ++
        box("moov", box("mvhd", mvhd.array()))
    }
    val dir = Fixtures.tmpDir("av")
    Files.write(dir.resolve("a.wav"), wavBytes(2))
    Files.write(dir.resolve("b.mp4"), mp4Bytes(600, 1500))
    Files.write(dir.resolve("c.bin"), "RIFFxxxxWAVEtruncated".getBytes) // corrupt wav
    Files.write(dir.resolve("d.bin"), "neither image nor av".getBytes)
    val decoded = Multimodal.decodeMediaMetaJvm(
      Multimodal.readBinaryDir(spark, dir.toString))
    val byType = decoded.collect()
      .map(r => r.getAs[String]("media_type") -> r.getAs[org.apache.spark.sql.Row]("meta"))
      .toMap
    val wav = byType("wav")
    assert(wav.getAs[Long]("duration_ms") == 2000L, s"wav meta: $wav")
    assert(wav.getAs[String]("codec") == "wav")
    assert(wav.isNullAt(wav.fieldIndex("width")))
    val mp4 = byType("mp4")
    assert(mp4.getAs[Long]("duration_ms") == 2500L, s"mp4 meta: $mp4")
    assert(mp4.getAs[String]("codec") == "mp4")
    assert(byType("bin") == null, "corrupt/unknown payloads must get null meta")
    // direct probe: image bytes still win the image path under the
    // combined decoder, and plain garbage is rejected by both
    assert(Multimodal.decodeAvHeader("garbage".getBytes).isEmpty)
    assert(Multimodal.decodeAvHeader(null).isEmpty)
  }

  test("REAL mp3 frame walk: duration from headers, ID3 skip, false-sync reject") {
    // MPEG1 Layer3, 128 kbps, 44100 Hz, no padding → 417-byte frames,
    // header FF FB 90 00; 1152 samples/frame → 26122 µs/frame
    def frame(n: Int = 1): Array[Byte] = {
      val f = new Array[Byte](417)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte; f(2) = 0x90.toByte; f(3) = 0x00
      Array.fill(n)(f).flatten
    }
    val three = frame(3)
    val got = Multimodal.decodeAvHeader(three)
    assert(got.isDefined, "3 valid frames must parse")
    assert(got.get.getAs[String](3) == "mp3")
    assert(got.get.getAs[Long](2) == 78L, s"3×26122µs → 78 ms, got ${got.get}") // 3*1152*1e6/44100/1000
    // ID3v2 prefix (10-byte header + 32-byte body, syncsafe size 32)
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 32) ++
      new Array[Byte](32) ++ three
    val tagged = Multimodal.decodeAvHeader(id3)
    assert(tagged.isDefined && tagged.get.getAs[Long](2) == 78L, s"ID3 skip: $tagged")
    // a lone sync word inside garbage must NOT be claimed as mp3
    // (≥2 consecutive frames required)
    val falseSync = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0) ++
      "definitely not audio data".getBytes
    assert(Multimodal.decodeAvHeader(falseSync).isEmpty, "single false sync rejected")
    // VBR: a 64 kbps MPEG2 frame (576 samples @ 22050 Hz) appended to the
    // CBR run contributes its own 26122 µs — walk must use per-frame tables
    val v2len = 576 / 8 * 64000 / 22050 // 208
    val v2 = new Array[Byte](v2len)
    v2(0) = 0xff.toByte; v2(1) = 0xf3.toByte; v2(2) = 0x80.toByte; v2(3) = 0x00
    val mixed = Multimodal.decodeAvHeader(three ++ v2)
    assert(mixed.isDefined && mixed.get.getAs[Long](2) == 104L, s"VBR sum: $mixed") // (3*26122+26122)/1000
  }

  test("REAL matroska/webm EBML walk: DocType + Duration × TimestampScale") {
    import java.nio.ByteBuffer
    def el(id: Array[Byte], body: Array[Byte]): Array[Byte] = {
      require(body.length < 127)
      id ++ Array((0x80 | body.length).toByte) ++ body
    }
    val ebmlHdr = el(Array(0x1a, 0x45, 0xdf.toByte, 0xa3.toByte),
      el(Array(0x42, 0x82.toByte), "webm".getBytes))
    def segment(ts: Option[Long], durF: Option[Float]): Array[Byte] = {
      val scale = ts.map(s => el(Array(0x2a, 0xd7.toByte, 0xb1.toByte),
        ByteBuffer.allocate(4).putInt(s.toInt).array())).getOrElse(Array[Byte]())
      val dur = durF.map(d => el(Array(0x44, 0x89.toByte),
        ByteBuffer.allocate(4).putFloat(d).array())).getOrElse(Array[Byte]())
      el(Array(0x18, 0x53, 0x80.toByte, 0x67),
        el(Array(0x15, 0x49, 0xa9.toByte, 0x66), scale ++ dur))
    }
    // default 1e6 ns ticks → Duration 12345.0 = 12345 ms
    val webm = Multimodal.decodeAvHeader(ebmlHdr ++ segment(None, Some(12345f)))
    assert(webm.isDefined, "webm must parse")
    assert(webm.get.getAs[String](3) == "webm")
    assert(webm.get.getAs[Long](2) == 12345L, s"default-scale duration: $webm")
    // explicit TimestampScale 2e6 ns doubles the wall-clock duration
    val scaled = Multimodal.decodeAvHeader(ebmlHdr ++ segment(Some(2000000L), Some(1000f)))
    assert(scaled.get.getAs[Long](2) == 2000L, s"scaled duration: $scaled")
    // Info present but no Duration → codec known, duration null
    val noDur = Multimodal.decodeAvHeader(ebmlHdr ++ segment(Some(1000000L), None))
    assert(noDur.isDefined && noDur.get.isNullAt(2) &&
      noDur.get.getAs[String](3) == "webm", s"no-duration: $noDur")
    // truncated EBML header alone (no Segment) → reject
    assert(Multimodal.decodeAvHeader(Array(0x1a, 0x45, 0xdf.toByte, 0xa3.toByte)).isEmpty)
  }

  test("sampleChunks explodes n offset-chunks per payload") {
    val df = Seq((1L, "0123456789abcdef".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.sampleChunks(df, col("payload"), n = 4, chunkBytes = 4)
      .select("chunk_no", "chunk").orderBy("chunk_no").collect()
    assert(out.length == 4)
    assert(new String(out(0).getAs[Array[Byte]]("chunk")) == "0123")
    assert(new String(out(2).getAs[Array[Byte]]("chunk")) == "89ab")
  }

  test("mapDecode runs a partition-batched row transform (decoder shape)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = Seq((1L, "abc".getBytes), (2L, "defg".getBytes)).toDF("media_id", "payload")
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("n_bytes", IntegerType)))
    val decoded = Multimodal.mapDecode(df, out)(rows =>
      rows.map(r => Row(r.getLong(0), r.getAs[Array[Byte]](1).length)))
    val m = decoded.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m == Map(1L -> 3, 2L -> 4))
  }

  test("distributed file hashing matches driver-side sha256") {
    val dir = binDir()
    val hashed = BinaryFiles.hashFiles(spark, dir + "/*")
      .orderBy("path").collect()
    assert(hashed.length == 2)
    hashed.foreach { r =>
      val local = graft.operators.Provenance.sha256File(
        r.getAs[String]("path").stripPrefix("file:"))
      assert(r.getAs[String]("sha256") == local)
    }
  }

  test("perceptual aHash: format-invariant, perturbation-tolerant, discriminative") {
    import java.awt.image.BufferedImage
    def img(f: (Int, Int) => Int, w: Int = 32, h: Int = 32): BufferedImage = {
      val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xff; im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      im
    }
    def bytes(im: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, fmt, bos); bos.toByteArray
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val gradient = img((x, _) => x * 8)
    val hBmp = Multimodal.imageAHash(bytes(gradient, "bmp")).get
    // the hash is a CONTENT fingerprint: PNG of the same pixels = same hash
    assert(Multimodal.imageAHash(bytes(gradient, "png")).get == hBmp,
      "lossless re-encode must not move the hash")
    // small perturbation (a few pixels) stays within small Hamming
    val perturbed = img((x, y) => if (x == 5 && y < 3) 255 else x * 8)
    assert(ham(Multimodal.imageAHash(bytes(perturbed, "bmp")).get, hBmp) <= 4,
      "few-pixel edit lands nearby")
    // a structurally different image (vertical gradient) is far away
    val other = img((_, y) => y * 8)
    assert(ham(Multimodal.imageAHash(bytes(other, "bmp")).get, hBmp) >= 16,
      "different structure lands far")
    // corrupt bytes degrade to None
    assert(Multimodal.imageAHash("not an image".getBytes).isEmpty)
    assert(Multimodal.imageAHash(null).isEmpty)
  }

  test("REAL resize: true output dimensions; structure survives; aHash stays near") {
    import java.awt.image.BufferedImage
    val src = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val v = (x * 8) & 0xff; src.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "bmp", bos)
    val resized = Multimodal.resizeImageBytes(bos.toByteArray, 8, 8).get
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(back.getWidth == 8 && back.getHeight == 8, "true output dimensions")
    // the horizontal gradient survives scaling: left column darker than right
    assert((back.getRGB(0, 4) & 0xff) < (back.getRGB(7, 4) & 0xff))
    // aHash is resize-tolerant by construction: small Hamming move
    val h0 = Multimodal.imageAHash(bos.toByteArray).get
    val h1 = Multimodal.imageAHash(resized).get
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 8,
      s"resize moved the perceptual hash too far: ${java.lang.Long.bitCount(h0 ^ h1)}")
    // DataFrame pass: resized column present, corrupt payload → null
    val df = Seq((1L, bos.toByteArray), (2L, "junk".getBytes)).toDF("id", "payload")
    val out = Multimodal.resizeImages(df, 8, 8).collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[Array[Byte]]("resized"))).toMap
    assert(out(1L).nonEmpty && out(2L).isEmpty, s"$out")
  }

  test("synthGrayBmp → decodeImageAHash: lossless loop; short gray arrays go null") {
    val rows = Seq(
      (1L, (0L until 64L).map(i => (i * 4) % 256)),  // full 8x8 raster
      (2L, Seq(1L, 2L, 3L))                          // too short → null payload
    ).toDF("id", "gray")
    val out = Multimodal.decodeImageAHash(
        Multimodal.synthGrayBmp(rows, "gray", 8, 8))
      .collect().map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[java.lang.Long]("ahash")),
          Option(r.getAs[java.lang.Long]("width"))))).toMap
    // the decoded raster is exactly the input values: recompute the
    // aHash arithmetically (64·g_i > Σg) and demand equality
    val g = (0L until 64L).map(i => (i * 4) % 256)
    val total = g.sum
    val expected = g.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
      if (64L * v > total) acc | (1L << i) else acc
    }
    assert(out(1L)._1.map(_.longValue()) == Some(expected),
      s"codec round-trip must equal the arithmetic hash: ${out(1L)}")
    assert(out(1L)._2.map(_.longValue()) == Some(8L))
    assert(out(2L) == ((None, None)), s"short gray array degrades to null: $out")
  }

  test("synthPcmWav → decodeAudioFingerprint: lossless loop; empty samples go null") {
    val samples = (0L until 128L).map(i => (i * 7) % 256)
    val rows = Seq((1L, samples), (2L, Seq.empty[Long])).toDF("id", "pcm")
    val withWav = Multimodal.synthPcmWav(rows, "pcm", 8000)
    // the WAV round-trip is lossless: decode the payload with the JDK
    // reader directly and demand the exact input bytes back
    val payload = withWav.filter(col("id") === 1L).collect()(0)
      .getAs[Array[Byte]]("payload")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val decoded = ais.readAllBytes().map(_ & 0xff).map(_.toLong).toSeq
    assert(decoded == samples, "PCM WAV round-trip must be lossless")
    assert(ais.getFormat.getSampleRate == 8000f &&
      ais.getFormat.getChannels == 1 && ais.getFormat.getSampleSizeInBits == 8)
    // fingerprint from the DECODED samples equals the arithmetic hash:
    // 64 blocks of 2 → bit b iff 64·(s_2b + s_2b+1) > Σs
    val out = Multimodal.decodeAudioFingerprint(withWav).collect()
      .map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[java.lang.Long]("afp")),
          Option(r.getAs[java.lang.Long]("n_samples")),
          Option(r.getAs[java.lang.Long]("sample_rate_hz"))))).toMap
    val total = samples.sum
    val expected = (0 until 64).foldLeft(0L) { (acc, b) =>
      if (64L * (samples(2 * b) + samples(2 * b + 1)) > total) acc | (1L << b)
      else acc
    }
    assert(out(1L)._1.map(_.longValue()) == Some(expected),
      s"codec round-trip must equal the arithmetic hash: ${out(1L)}")
    assert(out(1L)._2.map(_.longValue()) == Some(128L))
    assert(out(1L)._3.map(_.longValue()) == Some(8000L))
    assert(out(2L) == ((None, None, None)), s"empty samples degrade to null: $out")
  }

  test("synthMp4 → mp4SampleTable: real stsc/stco/stsz walk recovers padded chunk layout") {
    val frames = (0 until 8).map(i => f"frame-$i%02d-payload-bytes-here-pad." )
    val fl = frames.head.length.toLong // 32 ASCII bytes each
    assert(frames.forall(_.length == fl))
    val df = Seq((1L, frames), (2L, Seq.empty[String])).toDF("id", "frames")
    val mp4 = Multimodal.synthMp4(df, "frames", timescale = 1000,
      frameDurTicks = 40, chunkFrames = 3, interChunkPad = 8)
    val payload = mp4.filter(col("id") === 1L).collect()(0).getAs[Array[Byte]]("payload")
    // the container itself is a well-formed MP4: the duration probe
    // reads the real mvhd (8 frames x 40 ticks @ 1000 = 320 ms)
    val meta = Multimodal.decodeAvHeader(payload).get
    assert(meta.getAs[Long](2) == 320L && meta.getAs[String](3) == "mp4", s"$meta")
    // sample-table walk: offsets include the 8-byte inter-chunk pads
    // (frame i at 24 + fl·i + 8·(i div 3)) — derivable ONLY from stco
    val table = Multimodal.mp4SampleTable(payload).get
    val expected = (0 until 8).map(i => (i, 24L + fl * i + 8L * (i / 3), fl))
    assert(table == expected, s"demux must recover the padded layout: $table")
    // sliced frame bytes round-trip the original strings
    val out = Multimodal.demuxMp4Frames(mp4).collect()
      .map(r => r.getAs[Long]("id") ->
        Option(r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("frames"))).toMap
    val texts = out(1L).get.map(f => new String(f.getAs[Array[Byte]]("data"), "US-ASCII"))
    assert(texts == frames, s"frame bytes must round-trip: $texts")
    assert(out(2L).isEmpty, "empty frame list degrades to null payload -> null frames")
    // a fixed-size stsz (sample_size != 0) also walks: rebuild with
    // chunkFrames covering all frames in one chunk and no padding
    val one = Multimodal.synthMp4(Seq((3L, frames)).toDF("id", "frames"),
      "frames", 1000, 40, chunkFrames = 8, interChunkPad = 0)
    val t1 = Multimodal.mp4SampleTable(
      one.collect()(0).getAs[Array[Byte]]("payload")).get
    assert(t1 == (0 until 8).map(i => (i, 24L + fl * i, fl)), s"$t1")
    // garbage and truncation degrade to None
    assert(Multimodal.mp4SampleTable("not an mp4 at all".getBytes).isEmpty)
    assert(Multimodal.mp4SampleTable(java.util.Arrays.copyOf(payload, 40)).isEmpty)
    assert(Multimodal.mp4SampleTable(null).isEmpty)
    // a hostile stsz sample count (4 billion) must degrade to None,
    // never attempt the allocation
    val evil = payload.clone()
    val stszAt = (0 until evil.length - 4)
      .find(i => new String(evil, i, 4, "US-ASCII") == "stsz").get
    evil(stszAt + 12) = 0x7f.toByte // count field := 0x7fxxxxxx
    assert(Multimodal.mp4SampleTable(evil).isEmpty,
      "corrupt sample count must not allocate")
  }

  test("resampleWavBytes: exact box-filter decimation; envelope bits survive even-sample decimation") {
    val samples = (0L until 128L).map(i => ((i * 13) % 128) * 2)  // all even → no rounding
    val wav = Multimodal.synthPcmWav(Seq((1L, samples)).toDF("id", "pcm"), "pcm", 8000)
    val payload = wav.collect()(0).getAs[Array[Byte]]("payload")
    val half = Multimodal.resampleWavBytes(payload, 2).get
    // decoded output: halved rate, halved length, exact pair averages
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(half))
    assert(ais.getFormat.getSampleRate == 4000f)
    val out = ais.readAllBytes().map(_ & 0xffL).toSeq
    val expected = (0 until 64).map(i => (samples(2 * i) + samples(2 * i + 1)) / 2)
    assert(out == expected, "decimation must be the exact floor pair-average")
    // no rounding occurred → the envelope fingerprint is bit-identical
    val h0 = Multimodal.audioEnvelopeHash(payload).get
    val h1 = Multimodal.audioEnvelopeHash(half).get
    assert(h1._1 == h0._1,
      s"even-sample decimation must preserve every envelope bit: ${h0._1} vs ${h1._1}")
    assert(h1._2 == 64L && h1._3 == 4000L)
    // degradation: junk bytes and a factor longer than the clip → None
    assert(Multimodal.resampleWavBytes("junk".getBytes, 2).isEmpty)
    assert(Multimodal.resampleWavBytes(payload, 1000).isEmpty)
    // DataFrame pass: resampled column, corrupt payload → null
    val df = Seq((1L, payload), (2L, "junk".getBytes)).toDF("id", "payload")
    val rs = Multimodal.resampleWavs(df, 2).collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[Array[Byte]]("resampled"))).toMap
    assert(rs(1L).nonEmpty && rs(2L).isEmpty, s"$rs")
  }

  test("audioEnvelopeHash: encoding invariance, perturbation tolerance, rejection") {
    def wav16(levels: Seq[Long], bigEndian: Boolean): Array[Byte] = {
      // same waveform as 8-bit level v at 16-bit depth: signed 257·v−32768
      // (an affine map, so every block-vs-global compare is unchanged)
      val pcm = new Array[Byte](levels.length * 2)
      levels.zipWithIndex.foreach { case (v, i) =>
        val s16 = (257L * v - 32768L).toInt
        val (b0, b1) = ((s16 >> 8).toByte, (s16 & 0xff).toByte)
        if (bigEndian) { pcm(2 * i) = b0; pcm(2 * i + 1) = b1 }
        else { pcm(2 * i) = b1; pcm(2 * i + 1) = b0 }
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, bigEndian)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, levels.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val levels = (0L until 128L).map(i => (i * 29 + 3) % 256)
    val via8 = Multimodal.decodeAudioFingerprint(
        Multimodal.synthPcmWav(Seq((1L, levels)).toDF("id", "pcm"), "pcm", 8000))
      .collect()(0).getAs[java.lang.Long]("afp")
    val via16 = Multimodal.audioEnvelopeHash(wav16(levels, bigEndian = false))
    assert(via16.map(_._1) == Some(via8.longValue()),
      s"8-bit and 16-bit encodings of one waveform must fingerprint alike: $via8 vs $via16")
    assert(via16.map(_._2) == Some(128L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // a few-sample edit moves the envelope hash only slightly...
    val perturbed = levels.updated(5, (levels(5) + 9) % 256)
      .updated(77, (levels(77) + 5) % 256)
    val hPert = Multimodal.audioEnvelopeHash(wav16(perturbed, bigEndian = false)).get._1
    assert(ham(hPert, via8) <= 4,
      s"small edit moved the fingerprint too far: ${ham(hPert, via8)}")
    // ...while a structurally different waveform lands far away
    val other = (0L until 128L).map(i => if (i < 64) 250L else 5L)
    val hOther = Multimodal.audioEnvelopeHash(wav16(other, bigEndian = false)).get._1
    assert(ham(hOther, via8) >= 16,
      s"different waveform landed too close: ${ham(hOther, via8)}")
    // non-audio bytes and nulls degrade to None, never throw
    assert(Multimodal.audioEnvelopeHash("not audio".getBytes).isEmpty)
    assert(Multimodal.audioEnvelopeHash(null).isEmpty)
    // stereo is documented out of scope → None (2-channel WAV)
    val stereoFmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 2, 2, 8000f, false)
    val stereo = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](64)), stereoFmt, 32L)
    val sbos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stereo,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, sbos)
    assert(Multimodal.audioEnvelopeHash(sbos.toByteArray).isEmpty)
  }

  test("FrameDecoder seam: demux → pluggable decode → per-frame hash, fake codec") {
    import graft.operators.FrameDecoder
    // three demuxable frames: 16 B (4×4 raster), 9 B (3×3), 7 B (NOT a
    // perfect square — the undecodable path); the container is a real
    // chunked MP4, so the seam runs over true demuxed byte ranges
    val f0 = "aaaaaaaa" + "zzzzzzzz"    // 4×4: rows 0-1 dark, 2-3 bright
    val frames = Seq(f0, "b" * 9, "c" * 7)
    val mp4 = Multimodal.synthMp4(Seq((1L, frames)).toDF("media_id", "frames"),
      "frames", timescale = 1000, frameDurTicks = 40, chunkFrames = 2,
      interChunkPad = 4)
    val demuxed = Multimodal.demuxMp4Frames(mp4)
    val dec = Multimodal.decodeFramesWith(demuxed, FrameDecoder.SquareGray8Fake)
      .collect()(0).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("decoded")
    assert(dec.length == 3)
    assert(dec(0).getAs[Int]("width") == 4 && dec(0).getAs[Int]("height") == 4)
    assert(dec(0).getAs[Array[Byte]]("pixels").toSeq == f0.getBytes("US-ASCII").toSeq,
      "decoded raster is the demuxed frame bytes, sliced at the stco/stsz range")
    assert(dec(1).getAs[Int]("width") == 3)
    assert(dec(2).isNullAt(dec(2).fieldIndex("width")),
      "undecodable frame keeps frame_no with null raster, not dropped")
    // end-to-end per-frame fingerprint through the seam: 4×4 maps one
    // pixel per touched 8×8 cell (cy=2y, cx=2x); bright rows y=2,3 set
    // cells (4,{0,2,4,6}) and (6,{0,2,4,6})
    val expected = Seq(32, 34, 36, 38, 48, 50, 52, 54)
      .foldLeft(0L)((a, b) => a | (1L << b))
    val hashes = Multimodal.frameAHashesWith(mp4, FrameDecoder.SquareGray8Fake)
      .collect().map(r => r.getAs[Int]("frame_no") ->
        Option(r.getAs[java.lang.Long]("frame_hash"))).toMap
    assert(hashes(0).map(_.longValue()) == Some(expected), s"$hashes")
    assert(hashes(1).map(_.longValue()) == Some(0L),
      "uniform raster: no cell exceeds the global mean (strict >)")
    assert(hashes(2).isEmpty, "undecodable frame surfaces a null hash")
    // swapping the codec is the ONLY change a real decoder needs: a
    // second implementation drives the same operators unmodified
    object Inverted extends FrameDecoder {
      val name = "fake-inverted"
      def decodeFrame(d: Array[Byte]) = FrameDecoder.SquareGray8Fake
        .decodeFrame(d).map { case (w, h, px) =>
          (w, h, px.map(b => (255 - (b & 0xff)).toByte)) }
    }
    val inv = Multimodal.frameAHashesWith(mp4, Inverted)
      .collect().map(r => r.getAs[Int]("frame_no") ->
        Option(r.getAs[java.lang.Long]("frame_hash"))).toMap
    assert(inv(0).map(_.longValue()) == Some(Seq(0, 2, 4, 6, 16, 18, 20, 22)
      .foldLeft(0L)((a, b) => a | (1L << b))),
      "inverted codec flips which rows read bright — through the same operator")
  }

  test("FrameDecoder.ImageIo: REAL compressed frames through the seam (q227)") {
    import graft.operators.FrameDecoder
    // real compressed fixture: a 4×4 gray PNG written by ImageIO itself
    def pngOf(gray: Array[Int], w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      gray.zipWithIndex.foreach { case (v, i) =>
        img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v) }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val gray = Array(10, 20, 30, 40, 50, 60, 70, 80,
      90, 100, 110, 120, 130, 140, 250, 255)
    val png = pngOf(gray, 4, 4)
    // it IS compressed content: a PNG signature + deflate stream, not
    // a raster — the fake square-length decoder can't read it
    assert((png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 'P'.toInt, 'N'.toInt,
      'G'.toInt)), "fixture must be a real PNG")
    // lossless round-trip: decode returns the exact gray raster
    // (Rec.601 luma of a gray pixel is the identity — the property the
    // q227 oracle's arithmetic re-derivation rests on)
    val Some((w, h, px)) = FrameDecoder.ImageIo.decodeFrame(png)
    assert(w == 4 && h == 4 && px.map(_ & 0xff).toSeq == gray.toSeq)
    // bytes no ImageIO reader accepts degrade to None, never throw —
    // including a compressed-video-style sample (arbitrary bitstream)
    assert(FrameDecoder.ImageIo.decodeFrame("notanimage".getBytes).isEmpty)
    assert(FrameDecoder.ImageIo.decodeFrame(null).isEmpty)
    assert(FrameDecoder.ImageIo.decodeFrame(Array.empty[Byte]).isEmpty)
    // truncated PNG (header intact, deflate stream cut): decoder must
    // degrade, not abort the executor
    assert(FrameDecoder.ImageIo.decodeFrame(png.take(20)).isEmpty)
    // end-to-end through the REAL container + REAL codec: PNG frames
    // muxed into a real MP4, demuxed by the stco/stsc/stsz walk,
    // decoded by ImageIO, hashed per frame — one garbage frame mixed
    // in surfaces a null hash at its frame_no (auditable, not dropped)
    val frames: Seq[Array[Byte]] =
      Seq(png, "garbage-not-a-picture".getBytes("US-ASCII"),
        pngOf(Array.fill(16)(7), 4, 4))
    val mp4 = Multimodal.synthMp4FromBytes(
      Seq((1L, frames)).toDF("media_id", "frames"), "frames",
      timescale = 1000, frameDurTicks = 40, chunkFrames = 2, interChunkPad = 4)
    val hashes = Multimodal.frameAHashesWith(mp4, FrameDecoder.ImageIo)
      .collect().map(r => r.getAs[Int]("frame_no") ->
        Option(r.getAs[java.lang.Long]("frame_hash"))).toMap
    // 4×4: pixel (y,x) lands in cell (2y, 2x); cells with gray > mean
    // (mean = sum/16 = 94.6…, strict cross-multiplied compare)
    val expectedBits = gray.zipWithIndex.collect {
      case (v, i) if 16L * v > gray.map(_.toLong).sum =>
        (i / 4) * 2 * 8 + (i % 4) * 2
    }
    val expected = expectedBits.foldLeft(0L)((a, b) => a | (1L << b))
    assert(hashes(0).map(_.longValue()) == Some(expected), s"$hashes")
    assert(hashes(1).isEmpty, "non-image sample -> null hash")
    assert(hashes(2).map(_.longValue()) == Some(0L),
      "uniform frame: strict > sets no bit")
    // synthGrayFrames (the battery's frame synth) produces REAL PNGs
    // that round-trip through the real decoder to the input grays
    val synth = Multimodal.synthGrayFrames(
      Seq((1L, Seq(gray.map(_.toLong).toSeq))).toDF("id", "grays"),
      "grays", 4, 4)
      .collect()(0).getAs[scala.collection.Seq[Array[Byte]]]("_frames")
    assert(synth.length == 1)
    val Some((_, _, spx)) = FrameDecoder.ImageIo.decodeFrame(synth(0))
    assert(spx.map(_ & 0xff).toSeq == gray.toSeq,
      "synth PNG frame round-trips losslessly through the real codec")
  }
}
