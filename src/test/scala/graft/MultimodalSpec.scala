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
}
