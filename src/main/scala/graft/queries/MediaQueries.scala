package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.media.Multimodal

/** Multimodal queries. Every decode path is real JDK-codec work —
  * images (javax.imageio PNG), audio (javax.sound.sampled WAV), and
  * multi-frame containers (the GIF reader's frame API) — over
  * deterministic synthetic corpora whose payloads follow pure-integer
  * formulas, so each DuckDB oracle recomputes expected post-decode
  * results without a decoder of its own (see Multimodal's scaladoc).
  */
object MediaQueries {
  private val Dim = 16

  /** media_card's corpus corruption: every doc_id % 10 == 7 payload
    * truncated to 10 bytes, so the card's decode-failure rate is a live
    * number the oracle pins rather than a constant 0. */
  private[graft] def corruptPayloads(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("payload",
      when(col("id") % 10 === 7, expr("substring(payload, 1, 10)"))
        .otherwise(col("payload")))

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
    // perceptual hash over DECODED pixels: every bit of the 64-bit aHash
    // is recomputed by the oracle from the pixel formula, so the whole
    // decode → block-average → threshold chain is pinned. The corpus
    // renders each base image at two exposures (even/odd doc pairs) —
    // byte-level dedup can't see the duplication, the phash must.
    Q(
      "media_phash",
      (s, dir) =>
        Multimodal.imagePhash(
            Multimodal.syntheticPhashImages(Tables.documents(s, dir)))
          .toDF().orderBy("id"),
      Some {
        val v = Multimodal.phashPixelValueSql("d.id", "tx.x", "ty.y")
        s"""WITH d AS (SELECT doc_id AS id,
           |                  (8 + (doc_id // 2) % 16)::INT AS w,
           |                  (8 + (doc_id // 2) % 12)::INT AS h
           |           FROM documents),
           |px AS (
           |  SELECT d.id, d.w, d.h, ($v)::BIGINT AS v,
           |         ((ty.y * 8) // d.h) * 8 + (tx.x * 8) // d.w AS idx
           |  FROM d, range(0, 24) tx(x), range(0, 20) ty(y)
           |  WHERE tx.x < d.w AND ty.y < d.h),
           |g AS (SELECT id, sum(v) AS gs, count(*) AS n FROM px GROUP BY id),
           |blk AS (SELECT id, idx, sum(v) AS bs, count(*) AS bn
           |        FROM px GROUP BY id, idx),
           |bits AS (
           |  SELECT b.id, b.idx,
           |         CASE WHEN b.bs * g.n > g.gs * b.bn THEN 1 ELSE 0 END AS bit
           |  FROM blk b JOIN g USING (id))
           |SELECT id,
           |  bit_or(CASE WHEN idx < 32 AND bit = 1
           |              THEN (1::BIGINT << idx) ELSE 0 END) AS phash_lo,
           |  bit_or(CASE WHEN idx >= 32 AND bit = 1
           |              THEN (1::BIGINT << (idx - 32)) ELSE 0 END) AS phash_hi
           |FROM bits GROUP BY id ORDER BY id""".stripMargin
      },
      // benched: the one entry exercising the real PNG encode + decode +
      // hash path end-to-end (≈1.6 s warm for 5 000 images at sf0.1)
      bench = true
    ),
    // perceptual NEAR-DUP pairs at scale shape: 16-bit Hamming-LSH bands
    // (two identical bands of a 64-bit hash ⟺ hamming concentrated in
    // the others) — candidates come from a band equi-join carrying only
    // (id, lo, hi) scalars, never an all-pairs comparison; exact
    // bit_count(xor) filter on the candidates. The two-exposure corpus
    // guarantees the catch: every even/odd pair is the same picture.
    Q(
      "media_near_dup",
      (s, dir) =>
        Multimodal.phashNearDupPairs(
            Multimodal.imagePhash(
              Multimodal.syntheticPhashImages(Tables.documents(s, dir)))
              .toDF(),
            maxHamming = 8)
          .orderBy("id_a", "id_b"),
      Some {
        val v = Multimodal.phashPixelValueSql("d.id", "tx.x", "ty.y")
        s"""WITH d AS (SELECT doc_id AS id,
           |                  (8 + (doc_id // 2) % 16)::INT AS w,
           |                  (8 + (doc_id // 2) % 12)::INT AS h
           |           FROM documents),
           |px AS (
           |  SELECT d.id, ($v)::BIGINT AS v,
           |         ((ty.y * 8) // d.h) * 8 + (tx.x * 8) // d.w AS idx
           |  FROM d, range(0, 24) tx(x), range(0, 20) ty(y)
           |  WHERE tx.x < d.w AND ty.y < d.h),
           |g AS (SELECT id, sum(v) AS gs, count(*) AS n FROM px GROUP BY id),
           |blk AS (SELECT id, idx, sum(v) AS bs, count(*) AS bn
           |        FROM px GROUP BY id, idx),
           |ph AS (
           |  SELECT b.id,
           |    bit_or(CASE WHEN b.idx < 32 AND b.bs * g.n > g.gs * b.bn
           |                THEN (1::BIGINT << b.idx) ELSE 0 END) AS lo,
           |    bit_or(CASE WHEN b.idx >= 32 AND b.bs * g.n > g.gs * b.bn
           |                THEN (1::BIGINT << (b.idx - 32)) ELSE 0 END) AS hi
           |  FROM blk b JOIN g USING (id) GROUP BY b.id),
           |bands AS (
           |  SELECT id, lo, hi, t.bi,
           |         CASE t.bi WHEN 0 THEN lo % 65536
           |                   WHEN 1 THEN lo // 65536
           |                   WHEN 2 THEN hi % 65536
           |                   ELSE hi // 65536 END AS bv
           |  FROM ph, range(0, 4) t(bi)),
           |cand AS (
           |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           |         a.lo AS lo_a, a.hi AS hi_a, b.lo AS lo_b, b.hi AS hi_b
           |  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv
           |  WHERE a.id < b.id)
           |SELECT id_a, id_b,
           |       (bit_count(xor(lo_a, lo_b)) +
           |        bit_count(xor(hi_a, hi_b)))::INT AS hamming
           |FROM cand WHERE hamming <= 8
           |ORDER BY id_a, id_b""".stripMargin
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
    // REAL frame sampling: animated-GIF containers (a true multi-frame
    // format) parsed and per-frame decoded by the JDK's ImageIO reader;
    // the sampled frames' gray sums are recomputed by the oracle from
    // the frame formula — container mis-parse, wrong frame index, or
    // palette corruption breaks the hash. This replaced the byte-offset
    // stub: no honest decode stub remains in the media surface.
    Q(
      "media_frame_sample",
      (s, dir) =>
        Multimodal.frameSample(
            Multimodal.syntheticVideos(Tables.documents(s, dir)), 3)
          .toDF().orderBy("id", "sample_i"),
      Some {
        val v = Multimodal.frameValueSql("sm.id", "sm.frame_idx",
          "tx.x", "ty.y")
        s"""WITH d AS (SELECT doc_id AS id, (3 + doc_id % 4)::INT AS nf,
           |                  (8 + doc_id % 8)::INT AS w,
           |                  (8 + doc_id % 6)::INT AS h
           |           FROM documents),
           |sm AS (SELECT id, nf, w, h, t.i::INT AS sample_i,
           |              ((t.i * (nf - 1)) // 2)::INT AS frame_idx
           |       FROM d, range(0, 3) t(i)),
           |px AS (
           |  SELECT sm.id, sm.sample_i, sm.frame_idx, sm.w, sm.h,
           |         ($v)::BIGINT AS v
           |  FROM sm, range(0, 16) tx(x), range(0, 14) ty(y)
           |  WHERE tx.x < sm.w AND ty.y < sm.h)
           |SELECT id, sample_i, frame_idx, w AS dec_w, h AS dec_h,
           |       CAST(sum(v) AS BIGINT) AS fsum
           |FROM px GROUP BY id, sample_i, frame_idx, w, h
           |ORDER BY id, sample_i""".stripMargin
      }
    ),
    // REAL audio resample: decode → explicit 4× decimation (every output
    // sample oracle-recomputable from the signal formula) → real WAV
    // re-encode at 2 kHz. The audio mirror of media_resize.
    Q(
      "media_audio_resample",
      (s, dir) =>
        Multimodal.audioResample(
            Multimodal.syntheticAudio(Tables.documents(s, dir)), factor = 4)
          .toDF()
          .select("id", "src_rate", "dst_rate", "n_in", "n_out", "sample_sum")
          .orderBy("id"),
      Some {
        val v = Multimodal.sampleValueSql("d.id", "(4 * t.j)")
        s"""WITH d AS (SELECT doc_id AS id,
           |                  (256 + doc_id % 128)::INT AS n
           |           FROM documents),
           |sm AS (
           |  SELECT d.id, d.n, ($v)::BIGINT AS v
           |  FROM d, range(0, 96) t(j)
           |  WHERE t.j < (d.n + 3) // 4)
           |SELECT id, 8000::INT AS src_rate, 2000::INT AS dst_rate,
           |       min(n)::INT AS n_in, ((min(n) + 3) // 4)::INT AS n_out,
           |       CAST(sum(v) AS BIGINT) AS sample_sum
           |FROM sm GROUP BY id ORDER BY id""".stripMargin
      }
    ),
    // gain-invariant audio fingerprint over DECODED PCM — the audio
    // analog of media_phash: every bit compares two really-decoded
    // samples, and the oracle recomputes all 64 from the signal formula
    Q(
      "media_audio_fingerprint",
      (s, dir) =>
        Multimodal.audioFingerprint(
            Multimodal.syntheticGainAudio(Tables.documents(s, dir)))
          .toDF().orderBy("id"),
      Some {
        def p(off: Int) = s"(((t.j + $off) * (d.n - 1)) // 64)"
        val v0 = Multimodal.fpSampleValueSql("d.b", p(0))
        val v1 = Multimodal.fpSampleValueSql("d.b", p(1))
        s"""WITH d AS (SELECT doc_id AS id, doc_id // 2 AS b,
           |                  (256 + (doc_id // 2) % 128)::INT AS n
           |           FROM documents),
           |bits AS (
           |  SELECT d.id, t.j,
           |         CASE WHEN ($v1) > ($v0) THEN 1 ELSE 0 END AS bit
           |  FROM d, range(0, 64) t(j))
           |SELECT id,
           |  bit_or(CASE WHEN j < 32 AND bit = 1
           |              THEN (1::BIGINT << j) ELSE 0 END) AS fp_lo,
           |  bit_or(CASE WHEN j >= 32 AND bit = 1
           |              THEN (1::BIGINT << (j - 32)) ELSE 0 END) AS fp_hi
           |FROM bits GROUP BY id ORDER BY id""".stripMargin
      }
    ),
    // audio near-dup at scale shape: the same 16-bit Hamming-LSH band
    // join as the image path, over the gain-pair corpus — every even/odd
    // pair is the same recording at two loudnesses, invisible to byte
    // dedup, hamming 0 to the fingerprint
    Q(
      "media_audio_near_dup",
      (s, dir) =>
        Multimodal.phashNearDupPairs(
            Multimodal.audioFingerprint(
              Multimodal.syntheticGainAudio(Tables.documents(s, dir)))
              .toDF()
              .select(col("id"), col("fp_lo").as("phash_lo"),
                col("fp_hi").as("phash_hi")),
            maxHamming = 8)
          .orderBy("id_a", "id_b"),
      Some {
        def p(off: Int) = s"(((t.j + $off) * (d.n - 1)) // 64)"
        val v0 = Multimodal.fpSampleValueSql("d.b", p(0))
        val v1 = Multimodal.fpSampleValueSql("d.b", p(1))
        s"""WITH d AS (SELECT doc_id AS id, doc_id // 2 AS b,
           |                  (256 + (doc_id // 2) % 128)::INT AS n
           |           FROM documents),
           |bits AS (
           |  SELECT d.id, t.j,
           |         CASE WHEN ($v1) > ($v0) THEN 1 ELSE 0 END AS bit
           |  FROM d, range(0, 64) t(j)),
           |ph AS (
           |  SELECT id,
           |    bit_or(CASE WHEN j < 32 AND bit = 1
           |                THEN (1::BIGINT << j) ELSE 0 END) AS lo,
           |    bit_or(CASE WHEN j >= 32 AND bit = 1
           |                THEN (1::BIGINT << (j - 32)) ELSE 0 END) AS hi
           |  FROM bits GROUP BY id),
           |bands AS (
           |  SELECT id, lo, hi, t.bi,
           |         CASE t.bi WHEN 0 THEN lo % 65536
           |                   WHEN 1 THEN lo // 65536
           |                   WHEN 2 THEN hi % 65536
           |                   ELSE hi // 65536 END AS bv
           |  FROM ph, range(0, 4) t(bi)),
           |cand AS (
           |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           |         a.lo AS lo_a, a.hi AS hi_a, b.lo AS lo_b, b.hi AS hi_b
           |  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv
           |  WHERE a.id < b.id)
           |SELECT id_a, id_b,
           |       (bit_count(xor(lo_a, lo_b)) +
           |        bit_count(xor(hi_a, hi_b)))::INT AS hamming
           |FROM cand WHERE hamming <= 8
           |ORDER BY id_a, id_b""".stripMargin
      }
    ),
    // REAL pixel resize: decode → explicit nearest-neighbor resample
    // (integer floor coordinates, so the oracle recomputes every output
    // pixel from the corpus formula) → real PNG re-encode. gray_sum
    // totals the resized image; MediaSpec additionally re-decodes the
    // emitted payload pixel-for-pixel.
    Q(
      "media_resize",
      (s, dir) =>
        Multimodal.resizePixels(
            Multimodal.syntheticImages(Tables.documents(s, dir)),
            dw = 6, dh = 5)
          .toDF()
          .select("id", "src_w", "src_h", "width", "height", "gray_sum")
          .orderBy("id"),
      Some {
        val (dw, dh) = (6, 5)
        val v = Multimodal.pixelValueSql("d.id",
          s"((tx.x * d.sw) // $dw)", s"((ty.y * d.sh) // $dh)")
        s"""WITH d AS (SELECT doc_id AS id, (8 + doc_id % 16)::INT AS sw,
           |                  (8 + doc_id % 12)::INT AS sh
           |           FROM documents),
           |px AS (
           |  SELECT d.id, d.sw, d.sh, ($v)::BIGINT AS v
           |  FROM d, range(0, $dw) tx(x), range(0, $dh) ty(y))
           |SELECT id, sw AS src_w, sh AS src_h,
           |       $dw::INT AS width, $dh::INT AS height,
           |       CAST(sum(v) AS BIGINT) AS gray_sum
           |FROM px GROUP BY id, sw, sh ORDER BY id""".stripMargin
      }
    ),
    // the composed multimodal ingest report: all three decoders run over
    // corpora with DELIBERATE corruption (every doc_id % 10 == 7 payload
    // truncated to 10 bytes), so the decode-failure rate — THE metric a
    // real multimodal ingest watches — is a live number the oracle pins,
    // not a constant 0; plus perceptual near-dup counts among the
    // decodable images. One row per modality.
    Q(
      "media_card",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        def corrupt(df: org.apache.spark.sql.DataFrame) = corruptPayloads(df)
        val docs = Tables.documents(s, dir)
        // checkpoint: the decoded-hash frame feeds BOTH the near-dup
        // pair branch and the decode-failure aggregate — without the
        // barrier the PNG encode+decode+phash pipeline runs twice
        // (phashNearDupPairs checkpoints internally; this covers the
        // imgRow branch). Scalars only, one row per blob.
        val img = Multimodal.imagePhash(
          corrupt(Multimodal.syntheticPhashImages(docs))).toDF()
          .localCheckpoint()
        val imgOk = img.filter(col("phash_lo") =!= -1L ||
          col("phash_hi") =!= -1L)
        // weighted distinct-hash COUNT, not doc-pair enumeration: same
        // integer as phashNearDupPairs(...).count() (MediaSpec pins it)
        // but immune to duplicate-cluster quadratic growth — see
        // Multimodal.phashNearDupPairCount (r13)
        val pairs = Multimodal.phashNearDupPairCount(imgOk, maxHamming = 8)
        val imgRow = img
          .agg(count(lit(1)).as("n_blobs"),
            sum(when(col("phash_lo") === -1L && col("phash_hi") === -1L, 1L)
              .otherwise(0L)).as("n_decode_fail"))
          .crossJoin(pairs)
          .select(lit("image").as("kind"), col("n_blobs"),
            (col("n_blobs") - col("n_decode_fail")).as("n_decode_ok"),
            col("n_decode_fail"), col("near_dup_pairs"))
        val aud = Multimodal.audioFeatures(
          corrupt(Multimodal.syntheticAudio(docs)), Dim).toDF()
        val audRow = aud
          .agg(count(lit(1)).as("n_blobs"),
            sum(when(col("dec_rate") === -1, 1L).otherwise(0L))
              .as("n_decode_fail"))
          .select(lit("audio").as("kind"), col("n_blobs"),
            (col("n_blobs") - col("n_decode_fail")).as("n_decode_ok"),
            col("n_decode_fail"), lit(0L).as("near_dup_pairs"))
        val vid = Multimodal.frameSample(
          corrupt(Multimodal.syntheticVideos(docs)), 3).toDF()
        val vidRow = vid
          .select(col("id"), when(col("sample_i") === -1, 1L).otherwise(0L)
            .as("fail"))
          .groupBy("id").agg(max("fail").as("fail"))
          .agg(count(lit(1)).as("n_blobs"), sum("fail").as("n_decode_fail"))
          .select(lit("video").as("kind"), col("n_blobs"),
            (col("n_blobs") - col("n_decode_fail")).as("n_decode_ok"),
            col("n_decode_fail"), lit(0L).as("near_dup_pairs"))
        imgRow.unionByName(audRow).unionByName(vidRow).orderBy("kind")
      },
      Some {
        val v = Multimodal.phashPixelValueSql("d.id", "tx.x", "ty.y")
        s"""WITH d AS (SELECT doc_id AS id,
           |                  (8 + (doc_id // 2) % 16)::INT AS w,
           |                  (8 + (doc_id // 2) % 12)::INT AS h
           |           FROM documents WHERE doc_id % 10 <> 7),
           |px AS (
           |  SELECT d.id, ($v)::BIGINT AS v,
           |         ((ty.y * 8) // d.h) * 8 + (tx.x * 8) // d.w AS idx
           |  FROM d, range(0, 24) tx(x), range(0, 20) ty(y)
           |  WHERE tx.x < d.w AND ty.y < d.h),
           |g AS (SELECT id, sum(v) AS gs, count(*) AS n FROM px GROUP BY id),
           |blk AS (SELECT id, idx, sum(v) AS bs, count(*) AS bn
           |        FROM px GROUP BY id, idx),
           |ph AS (
           |  SELECT b.id,
           |    bit_or(CASE WHEN b.idx < 32 AND b.bs * g.n > g.gs * b.bn
           |                THEN (1::BIGINT << b.idx) ELSE 0 END) AS lo,
           |    bit_or(CASE WHEN b.idx >= 32 AND b.bs * g.n > g.gs * b.bn
           |                THEN (1::BIGINT << (b.idx - 32)) ELSE 0 END) AS hi
           |  FROM blk b JOIN g USING (id) GROUP BY b.id),
           |bands AS (
           |  SELECT id, lo, hi, t.bi,
           |         CASE t.bi WHEN 0 THEN lo % 65536
           |                   WHEN 1 THEN lo // 65536
           |                   WHEN 2 THEN hi % 65536
           |                   ELSE hi // 65536 END AS bv
           |  FROM ph, range(0, 4) t(bi)),
           |cand AS (
           |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           |         a.lo AS lo_a, a.hi AS hi_a, b.lo AS lo_b, b.hi AS hi_b
           |  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv
           |  WHERE a.id < b.id),
           |np AS (SELECT count(*) AS near_dup_pairs FROM cand
           |       WHERE bit_count(xor(lo_a, lo_b)) +
           |             bit_count(xor(hi_a, hi_b)) <= 8),
           |tot AS (SELECT count(*) AS n,
           |               count(CASE WHEN doc_id % 10 = 7 THEN 1 END) AS bad
           |        FROM documents)
           |SELECT k.kind, tot.n AS n_blobs,
           |       CAST(tot.n - tot.bad AS BIGINT) AS n_decode_ok,
           |       CAST(tot.bad AS BIGINT) AS n_decode_fail,
           |       CASE WHEN k.kind = 'image'
           |            THEN (SELECT near_dup_pairs FROM np)
           |            ELSE 0 END AS near_dup_pairs
           |FROM tot, (VALUES ('audio'), ('image'), ('video')) k(kind)
           |ORDER BY k.kind""".stripMargin
      }
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
