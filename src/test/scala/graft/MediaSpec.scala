package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.media.Multimodal

class MediaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val media =
    Multimodal.mediaFromDocuments(Tables.documents(spark, SparkTestSession.sf))

  test("feature extraction is deterministic and batch-shaped") {
    val a = Multimodal.extractFeatures(media, 16).collect()
      .map(f => f.id -> f.features).toMap
    val b = Multimodal.extractFeatures(media, 16).collect()
      .map(f => f.id -> f.features).toMap
    assert(a == b, "two runs must agree")
    assert(a.values.forall(_.length == 16))
    assert(a.values.toSeq.distinct.size > 1, "different payloads → different features")
  }

  test("frame sampling covers payload start and end, images excluded") {
    val frames = Multimodal.frameSample(media, 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.id % 2 == 1), "only non-image rows sampled")
    val byId = frames.groupBy(_.id)
    byId.values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
      assert(fs.find(_.frame_idx == 0).get.offset == 0)
    }
  }

  test("resize rewrites metadata only") {
    val r = Multimodal.resize(media, 320, 240)
    val row = r.select("width", "height").head()
    assert(row.getInt(0) == 320 && row.getInt(1) == 240)
    assert(r.columns.toSet == media.columns.toSet)
  }
}
