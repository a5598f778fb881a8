package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.functions.VectorFunctions
import graft.media.Multimodal
import graft.text.TextAnalysis

/** Multimodal plumbing queries. The decode stubs are integer arithmetic,
  * so even the mapPartitions path has a DuckDB oracle — pinning schema,
  * ordering, and batch plumbing despite the fake codec.
  */
object MediaQueries {
  private val Dim = 16

  val qs: Seq[Q] = Seq(
    Q(
      "media_features",
      (s, dir) =>
        Multimodal.extractFeatures(
            Multimodal.mediaFromDocuments(Tables.documents(s, dir)), Dim)
          .toDF()
          .select(col("id"),
            round(element_at(col("features"), 1), 6).as("f0"),
            round(expr("aggregate(features, 0D, (a, b) -> a + b)"), 6)
              .as("fsum")),
      Some {
        // payload bytes == UTF-8 text bytes (ASCII corpus) → byte hash ==
        // char hash of the text; features = hash-vector of that key.
        val key = TextAnalysis.charHashSql("text")
        val vec = VectorFunctions.hashVectorSql(s"($key)", Dim)
        s"""SELECT doc_id AS id,
           |  round(($vec)[1], 6) AS f0,
           |  round(list_reduce(list_prepend(0.0, $vec), (a, b) -> a + b), 6) AS fsum
           |FROM documents""".stripMargin
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
