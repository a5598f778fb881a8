package graft

import org.apache.spark.sql.functions.col
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

  test("sniffMime detects magic bytes, survives short/empty payloads") {
    import spark.implicits._
    val rows = Seq(
      ("jpeg", Array(0xFF, 0xD8, 0xFF, 0x01).map(_.toByte)),
      ("png", Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, 0x00)
        .map(_.toByte)),
      ("gif87", "GIF87a!".getBytes),
      ("wav", "RIFFxxxxWAVEdata".getBytes),
      ("avi", "RIFFxxxxAVI fram".getBytes),
      ("riff_only", "RIFFxxxx".getBytes), // truncated RIFF: no marker
      ("short", Array(0xFF.toByte)), // shorter than any magic
      ("empty", Array.emptyByteArray),
      ("text", "hello world".getBytes))
    val got = rows.toDF("name", "payload")
      .select(col("name"), graft.media.Multimodal.sniffMime(col("payload")).as("mime"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("jpeg") == "image/jpeg")
    assert(got("png") == "image/png")
    assert(got("gif87") == "image/gif")
    assert(got("wav") == "audio/wav")
    assert(got("avi") == "video/avi")
    assert(got("riff_only") == "application/octet-stream")
    assert(got("short") == "application/octet-stream")
    assert(got("empty") == "application/octet-stream")
    assert(got("text") == "application/octet-stream")
  }

  test("resize rewrites metadata only") {
    val r = Multimodal.resize(media, 320, 240)
    val row = r.select("width", "height").head()
    assert(row.getInt(0) == 320 && row.getInt(1) == 240)
    assert(r.columns.toSet == media.columns.toSet)
  }
}
