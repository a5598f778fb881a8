package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.media.Multimodal

/** Multimodal queries. Image decode is real (javax.imageio over
  * deterministic synthetic PNGs — see Multimodal's scaladoc for why the
  * oracle can still check it); the remaining frame-sample stub is integer
  * arithmetic, so even that mapPartitions path has a DuckDB oracle
  * pinning schema, ordering, and batch plumbing.
  */
object MediaQueries {
  private val Dim = 16

  val qs: Seq[Q] = Seq(
    // REAL image decode: the corpus is deterministic PNG bytes
    // (Multimodal.syntheticImages), Spark decodes them with javax.imageio
    // and buckets the decoded gray values; the oracle recomputes the same
    // bucket sums straight from the pixel FORMULA — wrong pixels, wrong
    // dims, or a channel-order bug on the decode side all break the hash.
    Q(
      "media_features",
      (s, dir) =>
        Multimodal.extractFeatures(
            Multimodal.syntheticImages(Tables.documents(s, dir)), Dim)
          .toDF()
          .select(col("id"), col("dec_w"), col("dec_h"),
            element_at(col("features"), 1).as("f0"),
            expr("aggregate(features, 0D, (a, b) -> a + b)").as("fsum"))
          .orderBy("id"),
      Some {
        val v = Multimodal.pixelValueSql("d.id", "tx.x", "ty.y")
        // fixed ranges cover the max synthetic dims (w ≤ 23, h ≤ 19);
        // the WHERE clause trims each image to its own grid (DuckDB 1.0
        // range() takes no lateral column args)
        s"""WITH d AS (SELECT doc_id AS id, (8 + doc_id % 16)::INT AS w,
           |                  (8 + doc_id % 12)::INT AS h
           |           FROM documents),
           |px AS (
           |  SELECT d.id, d.w, d.h, ($v)::INT AS v,
           |         (ty.y * d.w + tx.x) % $Dim AS b
           |  FROM d, range(0, 24) tx(x), range(0, 20) ty(y)
           |  WHERE tx.x < d.w AND ty.y < d.h)
           |SELECT id, w AS dec_w, h AS dec_h,
           |       sum(CASE WHEN b = 0 THEN v ELSE 0 END)::DOUBLE AS f0,
           |       sum(v)::DOUBLE AS fsum
           |FROM px GROUP BY id, w, h ORDER BY id""".stripMargin
      }
    ),
    // REAL audio decode: deterministic PCM WAV blobs parsed by the JDK's
    // javax.sound.sampled codec; bucket sums over the decoded frames are
    // recomputed by the oracle from the sample formula — a header
    // mis-parse, endianness bug, or frame miscount breaks the hash
    Q(
      "media_audio_features",
      (s, dir) =>
        Multimodal.audioFeatures(
            Multimodal.syntheticAudio(Tables.documents(s, dir)), Dim)
          .toDF()
          .select(col("id"), col("dec_rate"), col("dec_frames"),
            element_at(col("features"), 1).as("a0"),
            expr("aggregate(features, 0D, (a, b) -> a + b)").as("asum"))
          .orderBy("id"),
      Some {
        val v = Multimodal.sampleValueSql("d.id", "t.i")
        s"""WITH d AS (SELECT doc_id AS id,
           |                  (256 + doc_id % 128)::INT AS n
           |           FROM documents),
           |sm AS (
           |  SELECT d.id, d.n, t.i, ($v)::INT AS v
           |  FROM d, range(0, 384) t(i)
           |  WHERE t.i < d.n)
           |SELECT id, ${Multimodal.SynthRate} AS dec_rate, n AS dec_frames,
           |       sum(CASE WHEN i % $Dim = 0 THEN v ELSE 0 END)::DOUBLE AS a0,
           |       sum(v)::DOUBLE AS asum
           |FROM sm GROUP BY id, n ORDER BY id""".stripMargin
      }
    ),
    // exact-byte blob dedup — the first pass every image/video corpus
    // runs (identical files under different ids): content hash of the
    // OPAQUE payload, per-kind duplication stats. No decode needed, so
    // it is real (not stubbed) and linear at 100 TB (hash + groupBy).
    Q(
      "media_dedup",
      (s, dir) =>
        Multimodal.mediaFromDocuments(Tables.documents(s, dir))
          .select(col("kind"), md5(col("payload")).as("h"))
          .groupBy("kind")
          .agg(count(lit(1)).as("n_blobs"),
            countDistinct(col("h")).as("n_distinct"),
            (count(lit(1)) - countDistinct(col("h"))).as("n_dupes"))
          .orderBy("kind"),
      Some(
        """WITH m AS (
          |  SELECT CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS kind,
          |         md5(text) AS h
          |  FROM documents)
          |SELECT kind, count(*) AS n_blobs,
          |       count(DISTINCT h) AS n_distinct,
          |       count(*) - count(DISTINCT h) AS n_dupes
          |FROM m GROUP BY kind ORDER BY kind""".stripMargin)
    ),
    Q(
      "media_frame_sample",
      (s, dir) =>
        Multimodal.frameSample(
            Multimodal.mediaFromDocuments(Tables.documents(s, dir)), 4)
          .toDF().orderBy("id", "frame_idx"),
      Some(
        """WITH v AS (SELECT doc_id AS id, text FROM documents
          |           WHERE doc_id % 2 <> 0),
          |f AS (SELECT id, i AS frame_idx,
          |             ((i * (length(text) - 1)) // 3)::INT AS "offset", text
          |      FROM v, range(0, 4) t(i) WHERE length(text) > 0)
          |SELECT id, frame_idx, "offset",
          |       ascii(substr(text, "offset" + 1, 1)) AS byte_val
          |FROM f ORDER BY id, frame_idx""".stripMargin)
    ),
    // container-format sniffing from magic bytes — REAL (no codec):
    // payloads synthesized with deterministic JPEG/PNG/GIF/WAV headers
    // (doc_id mod 5 picks the family; mod 5 == 4 stays headerless), then
    // classified byte-first the way a mixed 100 TB media corpus screens
    // for mislabeled/corrupt blobs before decoding
    Q(
      "media_sniff",
      (s, dir) => {
        val text = col("text").cast("binary")
        def magic(bytes: Array[Byte]) = concat(lit(bytes), text)
        val payload = when(col("doc_id") % 5 === 0,
            magic(Array(0xFF, 0xD8, 0xFF).map(_.toByte)))
          .when(col("doc_id") % 5 === 1,
            magic(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
              .map(_.toByte)))
          .when(col("doc_id") % 5 === 2, magic("GIF89a".getBytes))
          .when(col("doc_id") % 5 === 3, magic("RIFF0000WAVE".getBytes))
          .otherwise(text)
        Tables.documents(s, dir)
          .select(Multimodal.sniffMime(payload).as("mime"))
          .groupBy("mime")
          .agg(count(lit(1)).as("n_blobs"))
          .orderBy("mime")
      },
      Some {
        val payload =
          """CASE doc_id % 5
            |  WHEN 0 THEN '\xFF\xD8\xFF'::BLOB || text::BLOB
            |  WHEN 1 THEN '\x89PNG\x0D\x0A\x1A\x0A'::BLOB || text::BLOB
            |  WHEN 2 THEN 'GIF89a'::BLOB || text::BLOB
            |  WHEN 3 THEN 'RIFF0000WAVE'::BLOB || text::BLOB
            |  ELSE text::BLOB END""".stripMargin
        s"""WITH m AS (SELECT $payload AS payload FROM documents)
           |SELECT ${Multimodal.sniffMimeSql("payload")} AS mime,
           |       count(*) AS n_blobs
           |FROM m GROUP BY mime ORDER BY mime""".stripMargin
      }
    )
  )
}
