package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{ImageHeader, MediaCodec, Multimodal}

/** Multimodal plumbing: container-header codec roundtrips, decode
  * determinism, fingerprint consistency with the SQL md5, resize math
  * bounds, frame-sample bounds.
  */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def features = Multimodal.extractFeatures(
    Multimodal.mediaTable(spark, Tables.documents(spark, dir)))

  test("PNG header roundtrip: build → parse recovers dimensions, CRC checked") {
    val b = MediaCodec.pngHeader(640, 480) ++ "payload".getBytes("UTF-8")
    assert(MediaCodec.parseImageHeader(b) === Some(ImageHeader(640, 480, 33)))
    // Corrupt one IHDR data byte: the CRC check must reject, not misparse.
    val corrupt = b.clone(); corrupt(17) = (corrupt(17) ^ 0x01).toByte
    assert(MediaCodec.parsePng(corrupt) === None)
    assert(MediaCodec.parsePng(b.take(20)) === None) // truncated
  }

  test("JPEG header roundtrip: segment walk reaches SOF0 past APP0") {
    val b = MediaCodec.jpegHeader(1024, 768) ++ "payload".getBytes("UTF-8")
    assert(MediaCodec.parseImageHeader(b) === Some(ImageHeader(1024, 768, 39)))
    // An extra COM segment before SOF0 must be walked over, shifting the
    // header length by its size.
    val com = Array(0xff, 0xfe, 0x00, 0x06, 'n', 'o', 't', 'e').map(_.toByte)
    val withCom = b.take(20) ++ com ++ b.drop(20) // splice after APP0
    assert(MediaCodec.parseImageHeader(withCom) === Some(ImageHeader(1024, 768, 47)))
    assert(MediaCodec.parseJpeg("plain text".getBytes("UTF-8")) === None)
    // Segment length running past the buffer must fail cleanly.
    assert(MediaCodec.parseJpeg(b.take(6)) === None)
  }

  test("image rows decode their real header dimensions; payload fingerprint excludes it") {
    import spark.implicits._
    val imgs = features.filter(_.media_type == "image").collect()
    assert(imgs.nonEmpty)
    imgs.foreach { f =>
      assert(f.width === (100 + f.doc_id % 900).toInt, s"doc ${f.doc_id}")
      assert(f.height === (100 + f.doc_id * 7 % 900).toInt, s"doc ${f.doc_id}")
      assert(f.duration_ms === 0L)
    }
    // n_bytes includes the container: 33 (PNG) / 39 (JFIF+SOF0).
    val docLens = Tables.documents(spark, dir)
      .select(col("doc_id"), octet_length(encode(col("text"), "utf-8")).as("len"))
      .as[(Long, Int)].collect().toMap
    imgs.foreach { f =>
      val hdr = if (f.doc_id % 6 == 0) 33 else 39
      assert(f.n_bytes === docLens(f.doc_id) + hdr, s"doc ${f.doc_id}")
    }
  }

  test("stub decode is deterministic across evaluations") {
    import spark.implicits._
    val a = features.orderBy("doc_id").collect().toSeq
    val b = features.orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("scala-side fingerprint equals the Catalyst md5 of the text") {
    val joined = features.toDF()
      .join(Tables.documents(spark, dir), Seq("doc_id"))
      .filter(col("fingerprint") =!= md5(col("text")))
    assert(joined.count() === 0)
  }

  test("resizeMeta fits the target box, preserves bounds, never upscales") {
    import spark.implicits._
    val resized = Multimodal.resizeMeta(features, maxW = 128, maxH = 128)
      .collect()
    val orig = features.collect().map(m => m.doc_id -> m).toMap
    resized.foreach { r =>
      val o = orig(r.doc_id)
      assert(r.width <= 128 && r.height <= 128)
      assert(r.width <= o.width && r.height <= o.height)
      assert(r.width > 0 && r.height > 0)
    }
  }

  test("frame samples exist only for videos, 1..3 frames, distinct hashes") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(features).collect().toSeq
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.values.forall(f => f.size >= 1 && f.size <= 3))
    assert(byDoc.values.forall(f => f.map(_.frame_hash).distinct.size == f.size))
    val videoIds = features.filter(_.media_type == "video").collect().map(_.doc_id).toSet
    assert(byDoc.keySet.subsetOf(videoIds))
  }
}
