package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.text.TextAnalysis

/** Multimodal column plumbing for training-data pipelines: media as
  * opaque `BinaryType` payloads + typed metadata columns, with decode /
  * feature-extract / resize / frame-sample as per-partition batch
  * operators over a typed Dataset.
  *
  * The actual image/audio codecs are NOT in this container — the decode
  * kernels below are **clearly-marked deterministic stubs** (byte-hash →
  * LCG feature vector; byte sampling for frames). Everything around them
  * is the real engineering: the binary schema, the `mapPartitions` batch
  * shape (one JVM call per partition, rows streamed through an iterator —
  * swap `fakeDecode` for a JNI/codec call and nothing else changes), and
  * partition-preserving metadata transforms. Because the stubs are pure
  * integer arithmetic they remain DuckDB-oracle-checkable, which pins the
  * plumbing (schema, ordering, null handling) even though the "decode" is
  * fake.
  */
object Multimodal {

  final case class MediaRow(id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)
  final case class MediaFeatures(id: Long, dim: Int, features: Seq[Double])
  final case class FrameSample(id: Long, frame_idx: Int, offset: Int,
      byte_val: Int)

  /** Derive a deterministic media table from `documents` (payload = the
    * UTF-8 text bytes standing in for an encoded blob). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      when(col("doc_id") % 2 === 0, "image").otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"))

  /** STUB decode: byte-stream hash standing in for a real decoder. */
  private def fakeDecodeKey(payload: Array[Byte]): Long =
    payload.foldLeft(0L)((a, b) =>
      (a * TextAnalysis.CharB + (b & 0xff)) % TextAnalysis.HashM)

  /** Batch feature extraction: one call per partition, rows streamed —
    * the Spark-native shape for wrapping a native/codec library. */
  def extractFeatures(media: DataFrame, dim: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("id", "kind", "payload", "width", "height").as[MediaRow]
      .mapPartitions { rows =>
        // per-partition setup would open the codec once here
        rows.map { r =>
          val key = fakeDecodeKey(r.payload)
          MediaFeatures(r.id, dim, VectorFunctions.hashVectorValues(key, dim))
        }
      }
  }

  /** Deterministic frame sampling for non-image media: n offsets spread
    * over the payload, emitting the byte at each offset (STUB for real
    * frame decode). */
  def frameSample(media: DataFrame, n: Int): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("id", "kind", "payload", "width", "height").as[MediaRow]
      .filter(_.kind != "image")
      .flatMap { r =>
        val len = r.payload.length
        (0 until n).flatMap { i =>
          if (len == 0) None
          else {
            val off = (i.toLong * (len - 1) / math.max(1, n - 1)).toInt
            Some(FrameSample(r.id, i, off, r.payload(off) & 0xff))
          }
        }
      }
  }

  /** Metadata-only resize: payload untouched (a real implementation would
    * re-encode per partition), dimensions scaled. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("width", lit(w)).withColumn("height", lit(h))

  /** Container-format sniffing from magic bytes — REAL, not a stub (no
    * codec needed): the first pass a mixed-media corpus runs to catch
    * mislabeled/corrupt blobs before they reach a decoder. Detects
    * JPEG (FF D8 FF), PNG (89 50 4E 47 0D 0A 1A 0A), GIF (GIF87a/89a),
    * RIFF-contained WAV/AVI (bytes 9-12 disambiguate), else
    * application/octet-stream. Pure codegen'd string ops over hex() —
    * linear, shuffle-free, works on any BinaryType column. */
  def sniffMime(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = hex(payload)
    when(h.startsWith("FFD8FF"), "image/jpeg")
      .when(h.startsWith("89504E470D0A1A0A"), "image/png")
      .when(h.startsWith("474946383761") || h.startsWith("474946383961"),
        "image/gif")
      .when(h.startsWith("52494646") && substring(h, 17, 8) === "57415645",
        "audio/wav")
      .when(h.startsWith("52494646") && substring(h, 17, 8) === "41564920",
        "video/avi")
      .otherwise("application/octet-stream")
  }

  /** DuckDB twin of [[sniffMime]] over a BLOB expression. */
  def sniffMimeSql(payload: String): String =
    s"""CASE
       |  WHEN starts_with(hex($payload), 'FFD8FF') THEN 'image/jpeg'
       |  WHEN starts_with(hex($payload), '89504E470D0A1A0A') THEN 'image/png'
       |  WHEN starts_with(hex($payload), '474946383761')
       |    OR starts_with(hex($payload), '474946383961') THEN 'image/gif'
       |  WHEN starts_with(hex($payload), '52494646')
       |   AND substring(hex($payload), 17, 8) = '57415645' THEN 'audio/wav'
       |  WHEN starts_with(hex($payload), '52494646')
       |   AND substring(hex($payload), 17, 8) = '41564920' THEN 'video/avi'
       |  ELSE 'application/octet-stream' END""".stripMargin
}
