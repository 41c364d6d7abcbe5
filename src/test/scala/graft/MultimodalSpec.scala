package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Multimodal plumbing: decode determinism, fingerprint consistency with
  * the SQL md5, resize math bounds, frame-sample bounds.
  */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def features = Multimodal.extractFeatures(
    Multimodal.mediaTable(spark, Tables.documents(spark, dir)))

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
