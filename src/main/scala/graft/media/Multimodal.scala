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
  * Decode is REAL across all three modalities, all on public JDK APIs
  * that work offline, all inside the `mapPartitions` batch shape (one
  * reader per partition, rows streamed through an iterator):
  *
  *  - images: `javax.imageio` PNG decode ([[extractFeatures]],
  *    [[imagePhash]]),
  *  - audio: `javax.sound.sampled` WAV/PCM decode ([[audioFeatures]]),
  *  - video-like: the JDK GIF reader's multi-frame API
  *    ([[frameSample]]) — the closest to video decode the JDK offers
  *    (no MP4-class codec ships with it).
  *
  * What keeps every kernel DuckDB-oracle-checkable without a decoder on
  * the oracle side is the corpus, not the kernel: the synthetic
  * generators encode real containers whose payload values follow
  * pure-integer formulas ([[pixelValue]], [[sampleValue]],
  * [[frameValue]]), so the oracle recomputes expected post-decode
  * results from the formula while Spark actually round-trips the bytes
  * through the codec — any decode defect (wrong pixels, wrong dims,
  * channel order, endianness, frame indexing) breaks the hash match.
  */
object Multimodal {

  final case class MediaRow(id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)
  final case class MediaFeatures(id: Long, dim: Int, dec_w: Int, dec_h: Int,
      features: Seq[Double])
  final case class FrameSample(id: Long, sample_i: Int, frame_idx: Int,
      dec_w: Int, dec_h: Int, fsum: Long)

  /** Derive a deterministic media table from `documents` (payload = the
    * UTF-8 text bytes standing in for an encoded blob). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      when(col("doc_id") % 2 === 0, "image").otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"))

  // ---- deterministic synthetic-image corpus: the decode test bed.
  // Gray value of pixel (x, y) of image `id` — pure integer arithmetic,
  // shared verbatim by the PNG generator, the MediaSpec round-trip
  // check, and the DuckDB oracle ([[pixelValueSql]]).
  def pixelValue(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt
  def pixelValueSql(id: String, x: String, y: String): String =
    s"(($id) * 31 + ($x) * 7 + ($y) * 13) % 256"
  /** Synthetic dims: small enough that the oracle's pixel-grid expansion
    * stays cheap, varied enough to catch transposed width/height. */
  def synthW(id: Long): Int = (8 + id % 16).toInt // 8..23
  def synthH(id: Long): Int = (8 + id % 12).toInt // 8..19

  /** A real PNG encode of an arbitrary gray-value grid (gray written to
    * all three RGB channels; PNG is lossless so decode returns the exact
    * values). */
  def pngOf(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // one bulk setRGB per image instead of per-pixel calls (r17): the
    // batch path writes the same packed value per element as the
    // per-pixel one, minus a synchronized color-model round-trip per
    // pixel — value-identical, measured ~2× on the encode stage
    val arr = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = px(x, y)
        arr(y * w + x) = (v << 16) | (v << 8) | v
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, arr, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Bulk-decoded packed-RGB pixels of a decoded image (r17): one
    * getRGB(0,0,w,h,..) call — the same ColorModel conversion as the
    * per-pixel getRGB, applied array-wise (value-identical, ~2-4×
    * faster on the PNG-decode consumers below). */
  private def rgbOf(img: java.awt.image.BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)

  // ImageIO's default stream cache is DISK-backed: every ImageIO.read/
  // write over an in-memory byte stream creates+deletes a temp FILE.
  // Harmless at one task; with the codec stages parallelized (idStream
  // below) it becomes 32 concurrent tasks × thousands of temp-file
  // round-trips of filesystem contention per query (r17: measured
  // media_resize 3.6→5.7 s WORSE after parallelizing, 3.6→1.0 s once
  // memory-backed). All payloads here are in-memory byte arrays — the
  // memory cache produces identical bytes by definition (same codec,
  // different scratch buffer).
  javax.imageio.ImageIO.setUseCache(false)

  /** The [[pixelValue]] grid as a real PNG. */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] =
    pngOf(w, h, (x, y) => pixelValue(id, x, y))

  /** Id stream for the synthetic generators, spread over the session's
    * default parallelism (r17, guide §2.5 "input skew: repartition
    * immediately after the read"): the source is a tiny few-split scan
    * of doc ids, but every id fans out into real codec work (PNG/WAV/
    * GIF encode and the downstream decode), so leaving the stage at
    * scan parallelism ran the whole corpus's codec chain on ONE core —
    * measured 3.7 s single-task for media_phash's 5 000 images at
    * sf0.1 on local[32]. The exchange moves 8-byte ids only; the
    * per-row codec work, not input bytes, is the cost, so core-count
    * partitioning is the right sizing at every scale. */
  private def idStream(docs: DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
  }

  /** Media table of REAL encoded PNG blobs, one per document id. The
    * encode runs per partition (ImageIO is executor-local JDK code), so
    * generation parallelizes like any other scan-shaped stage. */
  def syntheticImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    idStream(docs)
      .mapPartitions(_.map { id =>
        val w = synthW(id); val h = synthH(id)
        MediaRow(id, "image", syntheticPng(id, w, h), w, h)
      })
      .toDF()
  }

  // ---- perceptual image hash over DECODED pixels: the image analog of
  // MinHash dedup. A multimodal corpus dedups images the same exact-byte
  // pass can't catch (re-encoded / brightness-shifted copies).

  /** Brightness-variant corpus for the perceptual-dedup entries: doc i
    * renders the BASE image of id i/2 with a +40 gray offset when i is
    * odd — each even/odd pair is the same picture at two exposures, so
    * exact-byte dedup misses it and [[aHash]] must not. Values stay in
    * 0..255 (base % 216 + 40 max), so no clamp breaks the invariance.
    * The base pattern's stripe FREQUENCIES depend on the base id (not
    * just its brightness — aHash is brightness-invariant by design, so
    * an id-as-offset-only formula would collapse same-dimension images
    * into one hash and drown the demo in accidental matches). */
  def phashBaseValue(b: Long, x: Int, y: Int): Int =
    ((b * 31 + x * (7 + b % 5) + y * (13 + b % 3) +
      x * y * (1 + b % 7)) % 216).toInt
  def phashPixelValue(docId: Long, x: Int, y: Int): Int =
    phashBaseValue(docId / 2, x, y) + 40 * (docId % 2).toInt
  def phashPixelValueSql(docId: String, x: String, y: String): String = {
    val b = s"(($docId) // 2)"
    s"($b * 31 + ($x) * (7 + $b % 5) + ($y) * (13 + $b % 3)" +
      s" + ($x) * ($y) * (1 + $b % 7)) % 216 + 40 * (($docId) % 2)"
  }

  def syntheticPhashImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    idStream(docs)
      .mapPartitions(_.map { id =>
        val b = id / 2
        val w = synthW(b); val h = synthH(b)
        MediaRow(id, "image", pngOf(w, h, (x, y) => phashPixelValue(id, x, y)),
          w, h)
      })
      .toDF()
  }

  /** Average-hash (aHash) of a gray image: 8×8 block grid (pixel (x, y)
    * belongs to block ((x·8)/w, (y·8)/h)), bit by·8+bx set when the
    * block's mean exceeds the global mean. The compare runs in
    * cross-multiplied integer form (blockSum·N > globalSum·blockN) — a
    * uniform brightness shift adds c·blockN·N to both sides and cancels
    * EXACTLY, and every bit is reproducible by an integer-only oracle.
    * Returned as (lo = bits 0..31, hi = bits 32..63): two halves so no
    * bit ever shifts into the BIGINT sign position (DuckDB's `<<` checks
    * overflow; one 64-bit value would need bit 63). */
  def aHash(gray: Array[Int], w: Int, h: Int): (Long, Long) = {
    val n = w.toLong * h
    var gs = 0L
    var i = 0
    while (i < gray.length) { gs += gray(i); i += 1 }
    val bs = new Array[Long](64); val bn = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val idx = by * 8 + x * 8 / w
        bs(idx) += gray(y * w + x); bn(idx) += 1
        x += 1
      }
      y += 1
    }
    var lo = 0L; var hi = 0L
    var idx = 0
    while (idx < 64) {
      if (bn(idx) > 0 && bs(idx) * n > gs * bn(idx)) {
        if (idx < 32) lo |= 1L << idx else hi |= 1L << (idx - 32)
      }
      idx += 1
    }
    (lo, hi)
  }

  final case class ImagePhash(id: Long, phash_lo: Long, phash_hi: Long)

  /** Decode (real, javax.imageio) + [[aHash]] per partition. Undecodable
    * payloads hash to (-1, -1) — visibly distinct from any real hash. */
  def imagePhash(media: DataFrame): Dataset[ImagePhash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("id", "kind", "payload", "width", "height").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.payload))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) ImagePhash(r.id, -1L, -1L)
          else {
            val w = img.getWidth; val h = img.getHeight
            val gray = rgbOf(img)
            var i = 0
            while (i < gray.length) { gray(i) &= 0xff; i += 1 }
            val (lo, hi) = aHash(gray, w, h)
            ImagePhash(r.id, lo, hi)
          }
        }
      }
  }

  /** Perceptual near-dup pairs from a phash table (id, phash_lo,
    * phash_hi): 16-bit Hamming-LSH bands → candidate equi-join carrying
    * scalars only (never all-pairs) → exact bit_count(xor) filter;
    * buckets above `bucketCap` rows are thinned to O(n) candidates by
    * [[graft.dedup.BucketGuard]] (identical-hash clusters chain instead
    * of pairing quadratically).
    * Callers must pre-filter failed hashes ((-1, -1)): identical failure
    * markers would band-join every undecodable blob with every other. */
  def phashNearDupPairs(hashes: DataFrame, maxHamming: Int,
      bucketCap: Int = graft.dedup.BucketGuard.DefaultCap): DataFrame = {
    // checkpoint: the hash table (which may embed a decode pipeline)
    // feeds band-row generation AND the two pair join-backs below —
    // without the barrier the decode would run three times per row
    val hs = hashes.select("id", "phash_lo", "phash_hi").localCheckpoint()
    val banded = hs.select(col("id"),
        // the 128-bit hash pair IS the full signature: identical
        // (lo, hi) ⇒ collide in all four bands (the duplicate-cluster
        // case the hot-bucket guard exists for)
        xxhash64(col("phash_lo"), col("phash_hi")).as("fsig"),
        explode(array(
          struct(lit(0).as("bi"), (col("phash_lo") % 65536).as("bv")),
          struct(lit(1).as("bi"), expr("phash_lo div 65536").as("bv")),
          struct(lit(2).as("bi"), (col("phash_hi") % 65536).as("bv")),
          struct(lit(3).as("bi"), expr("phash_hi div 65536").as("bv"))))
          .as("b"))
      .select(col("id"), col("fsig"), col("b.bi"), col("b.bv"))
    graft.dedup.BucketGuard
      .candidatePairs(banded, "id", Seq("bi", "bv"), "fsig", bucketCap)
      .join(hs.select(col("id").as("id_a"),
        col("phash_lo").as("lo_a"), col("phash_hi").as("hi_a")), Seq("id_a"))
      .join(hs.select(col("id").as("id_b"),
        col("phash_lo").as("lo_b"), col("phash_hi").as("hi_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (expr("bit_count(lo_a ^ lo_b)") +
          expr("bit_count(hi_a ^ hi_b)")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact banded near-dup pair COUNT — same quantity as
    * `phashNearDupPairs(hashes, maxHamming).count()` computed WITHOUT
    * enumerating doc-level pairs, so the count path is immune to the
    * duplicate-cluster quadratic (r13, VERDICT r12 #1): a corpus whose
    * rows collapse onto a bounded perceptual-hash space (boilerplate
    * images; the synthetic decade corpus — see MediaScaleSpec) grows
    * identical-hash clusters linearly with rows and doc-level pair
    * counts quadratically. Any engine ENUMERATING pairs must pay that;
    * a COUNT doesn't have to:
    *
    *  - group to DISTINCT hashes with multiplicity `m` (one linear,
    *    map-side-combined aggregate);
    *  - identical-hash pairs (hamming 0, collide in all 4 bands by
    *    construction) contribute Σ m·(m−1)/2 — pure arithmetic;
    *  - cross-hash pairs come from the SAME banded self-join +
    *    BucketGuard as the enumerating path, but over distinct hashes
    *    only, each candidate weighted m_a·m_b after the Hamming check.
    *
    * The join input saturates with the hash space instead of growing
    * with the corpus, so at 100× the duplicate-driven blow-up (and the
    * knn_self_join-class risk of the doc-level BucketGuard cap engaging
    * and diverging from the unguarded oracle) is structurally gone —
    * the cap now bounds DISTINCT hashes per band bucket, a quantity
    * that stops growing once the hash space is covered. Group ids for
    * the guard's ordered join are each group's min doc id (`rid`):
    * unique across groups (a doc belongs to one group), so `rid_a <
    * rid_b` is a strict total order on distinct hashes and each
    * unordered hash pair is counted exactly once. MediaSpec pins
    * equality with the enumerating path on the real corpus and on a
    * duplicate-heavy synthetic one.
    *
    * EXACTNESS PRECONDITION (ADVICE r13): the count is exact only while
    * no (band, value) bucket holds more than `bucketCap` DISTINCT
    * hashes — above it BucketGuard's chain geometry would thin
    * candidates and this count would silently undercount vs the
    * enumerating oracle it exists to match. The guard below probes that
    * bound (one map-side aggregate over the already-checkpointed
    * distinct-hash frame — 4 rows per distinct hash) and fails LOUDLY
    * with the remedy instead of approximating. On the synthetic corpus
    * the bound holds at every corpus size by construction: the banded
    * frame saturates with the 14,976-value hash space, and
    * MediaScaleSpec pins that even the fully-saturated band buckets
    * stay under the default cap.
    */
  def phashNearDupPairCount(hashes: DataFrame, maxHamming: Int,
      bucketCap: Int = graft.dedup.BucketGuard.DefaultCap): DataFrame = {
    // checkpoint: the group table (which may embed a decode pipeline)
    // feeds the intra-group arithmetic AND the banded join branch
    val g = hashes.select("id", "phash_lo", "phash_hi")
      .groupBy("phash_lo", "phash_hi")
      .agg(count(lit(1)).as("m"), min(col("id")).as("rid"))
      .localCheckpoint()
    val intra = g.agg(coalesce(
      sum(col("m") * (col("m") - lit(1)) / lit(2)), lit(0))
      .cast("long").as("intra_pairs"))
    val banded = g.select(col("rid"),
        xxhash64(col("phash_lo"), col("phash_hi")).as("fsig"),
        explode(array(
          struct(lit(0).as("bi"), (col("phash_lo") % 65536).as("bv")),
          struct(lit(1).as("bi"), expr("phash_lo div 65536").as("bv")),
          struct(lit(2).as("bi"), (col("phash_hi") % 65536).as("bv")),
          struct(lit(3).as("bi"), expr("phash_hi div 65536").as("bv"))))
          .as("b"))
      .select(col("rid"), col("fsig"), col("b.bi"), col("b.bv"))
    // exactness guard — see the precondition in the Scaladoc above
    val hotBands = banded.groupBy("bi", "bv")
      .agg(count(lit(1)).as("__n")).filter(col("__n") > bucketCap).count()
    if (hotBands > 0) throw new IllegalStateException(
      s"phashNearDupPairCount: $hotBands band bucket(s) exceed " +
        s"bucketCap=$bucketCap DISTINCT hashes, so the guarded banded " +
        "join would no longer be exact — raise bucketCap (the join " +
        "input is distinct hashes, bounded by the hash space, not by " +
        "corpus size) or enumerate with phashNearDupPairs")
    val hs = g.select(col("rid"), col("phash_lo"), col("phash_hi"), col("m"))
    val inter = graft.dedup.BucketGuard
      .candidatePairs(banded, "rid", Seq("bi", "bv"), "fsig", bucketCap)
      .join(hs.select(col("rid").as("id_a"), col("phash_lo").as("lo_a"),
        col("phash_hi").as("hi_a"), col("m").as("m_a")), Seq("id_a"))
      .join(hs.select(col("rid").as("id_b"), col("phash_lo").as("lo_b"),
        col("phash_hi").as("hi_b"), col("m").as("m_b")), Seq("id_b"))
      // distinct hashes ⇒ hamming ≥ 1; identical-hash mass is intra's
      .filter(expr("bit_count(lo_a ^ lo_b)") +
        expr("bit_count(hi_a ^ hi_b)") <= maxHamming)
      .agg(coalesce(sum(col("m_a") * col("m_b")), lit(0))
        .cast("long").as("inter_pairs"))
    // two broadcast 1-row scalars — the accepted singleton-crossJoin shape
    intra.crossJoin(inter)
      .select((col("intra_pairs") + col("inter_pairs")).as("near_dup_pairs"))
  }

  // ---- deterministic synthetic-audio corpus: the WAV decode test bed.
  // Signed 16-bit sample i of clip `id` — pure integer arithmetic,
  // shared by the WAV generator, MediaSpec, and the DuckDB oracle.
  def sampleValue(id: Long, i: Int): Int =
    ((id * 31 + i * 7) % 65536).toInt - 32768
  def sampleValueSql(id: String, i: String): String =
    s"(($id) * 31 + ($i) * 7) % 65536 - 32768"
  def synthSamples(id: Long): Int = (256 + id % 128).toInt // 256..383
  val SynthRate = 8000

  /** A canonical 44-byte-header mono 16-bit PCM WAV of the
    * [[sampleValue]] signal — a REAL container the JDK's
    * `javax.sound.sampled` parses, not a stand-in blob. */
  def syntheticWav(id: Long, n: Int, rate: Int): Array[Byte] = {
    val dataSize = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) { bb.putShort(sampleValue(id, i).toShort); i += 1 }
    bb.array()
  }

  /** Audio table of real WAV blobs, one per document id. NOT routed
    * through [[idStream]] (r17): the WAV encode is a plain ByteBuffer
    * fill and the downstream decode goes through AudioSystem's
    * synchronized SPI provider scan per clip — parallelizing measured
    * 0.29→0.81 s (features) / 0.60→1.62 s (near_dup) WORSE at sf0.1 on
    * local[32]; the audio stages stay at scan parallelism. */
  def syntheticAudio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val n = synthSamples(id)
        MediaRow(id, "audio", syntheticWav(id, n, SynthRate), n, SynthRate)
      })
      .toDF()
  }

  final case class AudioFeatures(id: Long, dec_rate: Int, dec_frames: Int,
      features: Seq[Double])

  /** REAL audio decode (`javax.sound.sampled`, public JDK, offline) in
    * the same per-partition batch shape as [[extractFeatures]]: the WAV
    * container is parsed by the JDK codec, PCM frames are read back and
    * bucket-summed — feature d = Σ sample(i) over i ≡ d (mod dim),
    * integer-exact so the formula-driven oracle can recompute it. The
    * decoded sample rate and frame count are surfaced so container
    * mis-parses are visible defects. Undecodable payloads yield
    * dec_rate = dec_frames = -1 with the byte-hash stub features. */
  def audioFeatures(media: DataFrame, dim: Int): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("id", "kind", "payload", "width", "height").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val decoded =
            try {
              val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(r.payload))
              val fmt = in.getFormat
              if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
                  fmt.isBigEndian) None
              else {
                val bytes = in.readAllBytes()
                val bb = java.nio.ByteBuffer.wrap(bytes)
                  .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                val n = bytes.length / 2
                val sums = new Array[Double](dim)
                var i = 0
                while (i < n) { sums(i % dim) += bb.getShort(2 * i); i += 1 }
                Some(AudioFeatures(r.id, fmt.getSampleRate.toInt, n,
                  sums.toSeq))
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          decoded.getOrElse {
            val key = fakeDecodeKey(r.payload)
            AudioFeatures(r.id, -1, -1,
              VectorFunctions.hashVectorValues(key, dim))
          }
        }
      }
  }

  // ---- gain-invariant audio fingerprint over DECODED PCM: the audio
  // analog of [[aHash]]. Bit j compares the samples at two spread
  // positions (p_j, p_{j+1}); a positive gain scales both sides of the
  // comparison and cancels EXACTLY — the same invariance-by-integer-
  // arithmetic discipline as the image hash.

  /** Signal of the audio near-dup corpus: coefficients hash-spread per
    * base id (small coefficient classes would make unrelated clips share
    * most delta signs and drown the near-dup join in accidental
    * matches). Range ±16384 so a 2× gain still fits int16. */
  def fpSampleValue(b: Long, i: Int): Int = {
    val c2 = 7 + (b * 2654435761L) % 997
    val c1 = 5 + (b * 40503L) % 211
    ((b * 31 + i.toLong * i * c2 + i * c1) % 32768).toInt - 16384
  }
  def fpSampleValueSql(b: String, i: String): String =
    s"(($b) * 31 + ($i) * ($i) * (7 + (($b) * 2654435761) % 997)" +
      s" + ($i) * (5 + (($b) * 40503) % 211)) % 32768 - 16384"

  /** Two-gain corpus: doc i renders the base clip of id i/2 at gain
    * (1 + i%2) — same recording, different loudness; byte dedup misses
    * it, the fingerprint must not. */
  def syntheticGainAudio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // same scan-parallelism rationale as syntheticAudio (r17)
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val b = id / 2
        val n = synthSamples(b)
        val gain = 1 + (id % 2).toInt
        val dataSize = n * 2
        val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1)
          .putInt(SynthRate).putInt(SynthRate * 2).putShort(2).putShort(16)
          .put("data".getBytes("US-ASCII")).putInt(dataSize)
        var i = 0
        while (i < n) {
          bb.putShort((fpSampleValue(b, i) * gain).toShort); i += 1
        }
        MediaRow(id, "audio", bb.array(), n, SynthRate)
      })
      .toDF()
  }

  final case class AudioFp(id: Long, fp_lo: Long, fp_hi: Long)

  /** 64-bit delta-sign fingerprint of really-decoded PCM: bit j set when
    * sample(p_{j+1}) > sample(p_j), positions p_j = j·(n−1)/64 spread
    * over the clip. Undecodable payloads fingerprint to (-1, -1). */
  def audioFingerprint(media: DataFrame): Dataset[AudioFp] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("id", "kind", "payload", "width", "height").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val fp =
            try {
              val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(r.payload))
              val fmt = in.getFormat
              if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
                  fmt.isBigEndian) None
              else {
                val bytes = in.readAllBytes()
                val bb = java.nio.ByteBuffer.wrap(bytes)
                  .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                val n = bytes.length / 2
                var lo = 0L; var hi = 0L
                var j = 0
                while (j < 64) {
                  val p0 = (j.toLong * (n - 1) / 64).toInt
                  val p1 = ((j + 1).toLong * (n - 1) / 64).toInt
                  if (bb.getShort(2 * p1) > bb.getShort(2 * p0)) {
                    if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
                  }
                  j += 1
                }
                Some(AudioFp(r.id, lo, hi))
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          fp.getOrElse(AudioFp(r.id, -1L, -1L))
        }
      }
  }

  /** Fallback fingerprint for UNDECODABLE payloads (every decodable
    * modality above runs a real JDK codec): a deterministic byte-stream
    * hash so corrupt/foreign blobs still produce stable, comparable
    * feature rows instead of crashing the batch. */
  private def fakeDecodeKey(payload: Array[Byte]): Long =
    payload.foldLeft(0L)((a, b) =>
      (a * TextAnalysis.CharB + (b & 0xff)) % TextAnalysis.HashM)

  /** Batch feature extraction: one call per partition, rows streamed —
    * the Spark-native shape for wrapping a codec library.
    *
    * Image payloads are REALLY decoded (`javax.imageio`, executor-side);
    * feature d = Σ gray(x, y) over pixels with (y·width + x) ≡ d (mod
    * dim) — integer-exact bucket sums a formula-driven oracle can
    * recompute, with the decoded dims surfaced so a dimension mismatch
    * is a visible defect, not a silent one. Undecodable or non-image
    * payloads fall back to the byte-hash stub with dec_w/dec_h = -1. */
  def extractFeatures(media: DataFrame, dim: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("id", "kind", "payload", "width", "height").as[MediaRow]
      .mapPartitions { rows =>
        // per-partition setup (codec/reader instances) would live here
        rows.map { r =>
          val img =
            if (r.kind == "image")
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(r.payload))
              catch { case scala.util.control.NonFatal(_) => null }
            else null
          if (img != null) {
            val w = img.getWidth; val h = img.getHeight
            val rgb = rgbOf(img)
            val sums = new Array[Double](dim)
            var i = 0
            while (i < rgb.length) {
              sums(i % dim) += (rgb(i) & 0xff)
              i += 1
            }
            MediaFeatures(r.id, dim, w, h, sums.toSeq)
          } else {
            val key = fakeDecodeKey(r.payload)
            MediaFeatures(r.id, dim, -1, -1,
              VectorFunctions.hashVectorValues(key, dim))
          }
        }
      }
  }

  // ---- deterministic synthetic-video corpus: the frame-decode test
  // bed. An animated GIF is a real multi-frame container the JDK's
  // ImageIO reads frame-by-frame — the closest thing to video decode
  // that needs no codec beyond the JDK.
  def frameValue(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f * 97 + x * 7 + y * 13) % 256).toInt
  def frameValueSql(id: String, f: String, x: String, y: String): String =
    s"(($id) * 31 + ($f) * 97 + ($x) * 7 + ($y) * 13) % 256"
  def synthFrames(id: Long): Int = (3 + id % 4).toInt // 3..6
  def synthVidW(id: Long): Int = (8 + id % 8).toInt // 8..15
  def synthVidH(id: Long): Int = (8 + id % 6).toInt // 8..13

  /** 256-gray palette: GIF stores the palette verbatim, so gray values
    * survive encode+decode exactly (TYPE_BYTE_GRAY would pass through a
    * colorspace conversion instead). */
  private def grayPalette = {
    val g = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** A real animated GIF of the [[frameValue]] frames. */
  def syntheticGif(id: Long, frames: Int, w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < frames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.getRaster.setSample(x, y, 0, frameValue(id, f, x, y)); x += 1
        }
        y += 1
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  /** Video table of real animated-GIF blobs, one per document id. */
  def syntheticVideos(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    idStream(docs)
      .mapPartitions(_.map { id =>
        MediaRow(id, "video",
          syntheticGif(id, synthFrames(id), synthVidW(id), synthVidH(id)),
          synthVidW(id), synthVidH(id))
      })
      .toDF()
  }

  /** REAL frame sampling: the container is opened with the JDK's GIF
    * ImageReader, `n` frame indexes are spread over the decoded frame
    * count (index i ↦ i·(F−1)/(n−1)), and each sampled frame is decoded
    * and gray-summed — integer-exact, so the oracle recomputes fsum from
    * the frame formula while Spark actually runs the container parse +
    * per-frame decode. Replaces the former byte-offset stub: this is the
    * per-partition batch shape a real video codec would occupy, now
    * exercising a real (JDK) multi-frame decoder. Undecodable payloads
    * emit one (-1, -1, -1, -1) marker row. */
  def frameSample(media: DataFrame, n: Int): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("id", "kind", "payload", "width", "height").as[MediaRow]
      .filter(_.kind != "image")
      .flatMap { r =>
        try {
          val reader = javax.imageio.ImageIO
            .getImageReadersByFormatName("gif").next()
          try {
            reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(r.payload)))
            val frames = reader.getNumImages(true)
            if (frames < 1) throw new IllegalArgumentException("no frames")
            (0 until n).map { i =>
              val fi = (i.toLong * (frames - 1) / math.max(1, n - 1)).toInt
              val img = reader.read(fi)
              val w = img.getWidth; val h = img.getHeight
              val rgb = rgbOf(img)
              var fsum = 0L
              var p = 0
              while (p < rgb.length) { fsum += rgb(p) & 0xff; p += 1 }
              FrameSample(r.id, i, fi, w, h, fsum)
            }
          } finally reader.dispose()
        } catch {
          case scala.util.control.NonFatal(_) =>
            Seq(FrameSample(r.id, -1, -1, -1, -1, -1L))
        }
      }
  }

  /** Metadata-only resize: payload untouched, dimensions scaled — the
    * cheap planning-stage form ([[resizePixels]] is the real one). */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("width", lit(w)).withColumn("height", lit(h))

  final case class ResizedImage(id: Long, src_w: Int, src_h: Int,
      width: Int, height: Int, payload: Array[Byte], gray_sum: Long)

  /** REAL resize over decoded pixels: javax.imageio decode, explicit
    * nearest-neighbor resample — dst(x, y) = src((x·sw)/dw, (y·sh)/dh)
    * with integer floor, spelled out rather than delegated to
    * Graphics2D so every output pixel is oracle-recomputable — then a
    * real PNG re-encode of the result. `gray_sum` totals the resized
    * gray values (the decode→resample→re-encode round-trip check; the
    * payload itself re-decodes to exactly these pixels, MediaSpec pins
    * it). Runs per partition like every other codec stage; undecodable
    * payloads → dims −1, empty payload, gray_sum −1. */
  def resizePixels(media: DataFrame, dw: Int, dh: Int)
      : Dataset[ResizedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("id", "kind", "payload", "width", "height").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.payload))
            if (img == null) throw new java.io.IOException("undecodable")
            val sw = img.getWidth; val sh = img.getHeight
            val src = rgbOf(img)
            val out = new java.awt.image.BufferedImage(
              dw, dh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val arr = new Array[Int](dw * dh)
            var gs = 0L
            var y = 0
            while (y < dh) {
              val srow = (y * sh / dh) * sw
              var x = 0
              while (x < dw) {
                val v = src(srow + x * sw / dw) & 0xFF
                gs += v
                arr(y * dw + x) = (v << 16) | (v << 8) | v
                x += 1
              }
              y += 1
            }
            out.setRGB(0, 0, dw, dh, arr, 0, dw)
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            ResizedImage(r.id, sw, sh, dw, dh, bos.toByteArray, gs)
          } catch {
            case scala.util.control.NonFatal(_) =>
              ResizedImage(r.id, -1, -1, -1, -1, Array.emptyByteArray, -1L)
          }
        }
      }
  }

  final case class ResampledAudio(id: Long, src_rate: Int, dst_rate: Int,
      n_in: Int, n_out: Int, payload: Array[Byte], sample_sum: Long)

  /** REAL audio resample over decoded PCM — the audio analog of
    * [[resizePixels]]: javax.sound decode, explicit decimation (every
    * `factor`-th sample, spelled out so each output sample is
    * oracle-recomputable), real WAV re-encode at rate/factor.
    * `sample_sum` totals the resampled signal (the round-trip check;
    * MediaSpec re-decodes the payload sample-for-sample). Only 16-bit
    * mono little-endian input is resampled; anything else (or an
    * undecodable payload) degrades to a marked row. */
  def audioResample(media: DataFrame, factor: Int): Dataset[ResampledAudio] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("id", "kind", "payload", "width", "height").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.payload))
            val fmt = in.getFormat
            if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
                fmt.isBigEndian)
              throw new java.io.IOException("unsupported PCM layout")
            val bytes = in.readAllBytes()
            val bb = java.nio.ByteBuffer.wrap(bytes)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val n = bytes.length / 2
            val nOut = (n + factor - 1) / factor
            val srcRate = fmt.getSampleRate.toInt
            val dstRate = srcRate / factor
            val dataSize = nOut * 2
            val out = java.nio.ByteBuffer.allocate(44 + dataSize)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
              .put("WAVE".getBytes("US-ASCII"))
              .put("fmt ".getBytes("US-ASCII")).putInt(16)
              .putShort(1).putShort(1)
              .putInt(dstRate).putInt(dstRate * 2).putShort(2).putShort(16)
              .put("data".getBytes("US-ASCII")).putInt(dataSize)
            var sum = 0L
            var j = 0
            while (j < nOut) {
              val v = bb.getShort(2 * j * factor)
              sum += v
              out.putShort(v)
              j += 1
            }
            ResampledAudio(r.id, srcRate, dstRate, n, nOut,
              out.array(), sum)
          } catch {
            case scala.util.control.NonFatal(_) =>
              ResampledAudio(r.id, -1, -1, -1, -1, Array.emptyByteArray, -1L)
          }
        }
      }
  }

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
