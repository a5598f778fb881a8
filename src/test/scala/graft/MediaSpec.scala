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

  test("weighted pair count equals enumerated pair count (real + duplicate-heavy corpora)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // real corpus: the exact frame media_card feeds it
    val img = Multimodal.imagePhash(
      graft.queries.MediaQueries.corruptPayloads(
        Multimodal.syntheticPhashImages(Tables.documents(spark, SparkTestSession.sf))))
      .toDF().localCheckpoint()
    val ok = img.filter(col("phash_lo") =!= -1L || col("phash_hi") =!= -1L)
    val enumerated = Multimodal.phashNearDupPairs(ok, maxHamming = 8).count()
    val weighted = Multimodal.phashNearDupPairCount(ok, maxHamming = 8)
      .head().getLong(0)
    assert(enumerated > 0, "corpus must actually exercise the pair path")
    assert(weighted == enumerated,
      s"weighted count $weighted != enumerated $enumerated on the real corpus")
    // duplicate-heavy synthetic: big identical-hash clusters (the intra
    // arithmetic path) + near-miss hashes one bit apart (the weighted
    // cross-hash path) + a far-away hash that must NOT count
    val rows = Seq.tabulate(40)(i => (i.toLong, 0x1234L, 0x5678L)) ++ // m=40 cluster
      Seq.tabulate(7)(i => (100L + i, 0x1235L, 0x5678L)) ++ // hamming 1 from cluster
      Seq.tabulate(5)(i => (200L + i, -1L, -1L)) // hamming 64+64 — out of range
    val hs = rows.toDF("id", "phash_lo", "phash_hi")
    val e2 = Multimodal.phashNearDupPairs(hs, maxHamming = 8).count()
    val w2 = Multimodal.phashNearDupPairCount(hs, maxHamming = 8)
      .head().getLong(0)
    // closed form: C(40,2) + C(7,2) + 40*7 intra/inter + C(5,2) for the
    // identical far cluster
    assert(w2 == 40 * 39 / 2 + 7 * 6 / 2 + 40 * 7 + 5 * 4 / 2)
    assert(w2 == e2, s"weighted $w2 != enumerated $e2 on the synthetic corpus")
  }

  test("the exact-count guard throws loudly when a band bucket exceeds the cap") {
    // ADVICE r13: above the cap BucketGuard's chain geometry would thin
    // candidates and the "exact" count would silently undercount — the
    // guard must fail with the remedy instead. 6 DISTINCT hashes share
    // band (2, hi%65536=0) > cap 4; each is its own fsig group, so the
    // chain branch would emit nothing and the count would be wrong.
    import spark.implicits._
    val hs = Seq.tabulate(6)(i => (i.toLong, i.toLong, 0L))
      .toDF("id", "phash_lo", "phash_hi")
    val e = intercept[IllegalStateException] {
      Multimodal.phashNearDupPairCount(hs, maxHamming = 8, bucketCap = 4)
    }
    assert(e.getMessage.contains("bucketCap=4"))
    // the same frame under the default cap stays on the exact path
    assert(Multimodal.phashNearDupPairCount(hs, maxHamming = 8)
      .head().getLong(0) ==
      Multimodal.phashNearDupPairs(hs, maxHamming = 8).count())
  }

  test("synthetic PNG round-trips through javax.imageio byte-for-byte") {
    val id = 37L
    val w = Multimodal.synthW(id); val h = Multimodal.synthH(id)
    val png = Multimodal.syntheticPng(id, w, h)
    // really a PNG container, not a stand-in blob
    assert(Multimodal.sniffMime(org.apache.spark.sql.functions.lit(png)) != null)
    assert((png.take(8).map(_ & 0xff) sameElements
      Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = Multimodal.pixelValue(id, x, y)
      assert((img.getRGB(x, y) & 0xffffff) == ((v << 16) | (v << 8) | v),
        s"pixel ($x,$y) of image $id decoded wrong")
    }
  }

  test("extractFeatures really decodes: features equal formula-computed sums") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 40L).toDF("doc_id")
      .withColumn("text", org.apache.spark.sql.functions.lit("x"))
    val got = Multimodal
      .extractFeatures(Multimodal.syntheticImages(docs), 16)
      .collect().map(f => f.id -> f).toMap
    Seq(1L, 2L, 40L).foreach { id =>
      val f = got(id)
      val w = Multimodal.synthW(id); val h = Multimodal.synthH(id)
      assert(f.dec_w == w && f.dec_h == h, "decoded dims must match encoded")
      val expect = new Array[Double](16)
      for (y <- 0 until h; x <- 0 until w)
        expect((y * w + x) % 16) += Multimodal.pixelValue(id, x, y)
      assert(f.features == expect.toSeq, s"feature sums for image $id")
    }
  }

  test("synthetic WAV round-trips through javax.sound.sampled sample-for-sample") {
    val id = 21L
    val n = Multimodal.synthSamples(id)
    val wav = Multimodal.syntheticWav(id, n, Multimodal.SynthRate)
    // a real RIFF/WAVE container — the magic-byte sniffer agrees
    import spark.implicits._
    val mime = Seq(Tuple1(wav)).toDF("payload")
      .select(Multimodal.sniffMime(org.apache.spark.sql.functions.col("payload")))
      .head().getString(0)
    assert(mime == "audio/wav")
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(in.getFormat.getSampleRate.toInt == Multimodal.SynthRate)
    val bytes = in.readAllBytes()
    assert(bytes.length == n * 2)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach { i =>
      assert(bb.getShort(2 * i) == Multimodal.sampleValue(id, i).toShort,
        s"sample $i of clip $id decoded wrong")
    }
  }

  test("audioFeatures really decodes: bucket sums equal the sample formula") {
    import spark.implicits._
    val docs = Seq(3L, 21L, 130L).toDF("doc_id")
    val got = Multimodal
      .audioFeatures(Multimodal.syntheticAudio(docs), 16)
      .collect().map(f => f.id -> f).toMap
    Seq(3L, 21L, 130L).foreach { id =>
      val f = got(id)
      val n = Multimodal.synthSamples(id)
      assert(f.dec_rate == Multimodal.SynthRate && f.dec_frames == n)
      val expect = new Array[Double](16)
      (0 until n).foreach(i => expect(i % 16) += Multimodal.sampleValue(id, i))
      assert(f.features == expect.toSeq, s"bucket sums for clip $id")
    }
  }

  test("aHash is exposure-invariant: both renders of a base image hash equal") {
    import spark.implicits._
    val docs = (0L until 20L).toDF("doc_id")
    val got = Multimodal
      .imagePhash(Multimodal.syntheticPhashImages(docs))
      .collect().map(p => p.id -> (p.phash_lo, p.phash_hi)).toMap
    (0L until 10L).foreach { m =>
      assert(got(2 * m) == got(2 * m + 1),
        s"base $m: the +40-exposure render must hash identically")
      assert(got(2 * m) != ((-1L, -1L)), "decode must have succeeded")
    }
    // and the corpus is not degenerate: different bases hash differently
    assert(got.values.toSet.size > 5, got.values.toSet)
  }

  test("aHash discriminates: a structurally different image hashes differently") {
    // same dims, different stripe frequency → different block-mean
    // pattern; also pin one hand-computed property: a constant image has
    // no block above the global mean, so the hash is all zeros
    val w = 16; val h = 12
    val flat = Array.fill(w * h)(100)
    assert(Multimodal.aHash(flat, w, h) == ((0L, 0L)))
    val gradX = Array.tabulate(w * h)(i => (i % w) * 10)
    val gradY = Array.tabulate(w * h)(i => (i / w) * 10)
    assert(Multimodal.aHash(gradX, w, h) != Multimodal.aHash(gradY, w, h))
    // brightness shift cancels exactly (the cross-multiplied compare)
    assert(Multimodal.aHash(gradX.map(_ + 40), w, h) ==
      Multimodal.aHash(gradX, w, h))
  }

  test("audio fingerprint is gain-invariant and discriminating") {
    import spark.implicits._
    val docs = (0L until 20L).toDF("doc_id")
    val got = Multimodal
      .audioFingerprint(Multimodal.syntheticGainAudio(docs))
      .collect().map(f => f.id -> (f.fp_lo, f.fp_hi)).toMap
    (0L until 10L).foreach { m =>
      assert(got(2 * m) == got(2 * m + 1),
        s"base $m: the 2x-gain render must fingerprint identically")
      assert(got(2 * m) != ((-1L, -1L)), "decode must have succeeded")
    }
    assert(got.values.toSet.size == 10, "distinct bases fingerprint apart")
  }

  test("undecodable payloads fall back to the stub with dec dims = -1") {
    import spark.implicits._
    val junk = Seq((1L, "image", "not a png".getBytes, 4, 4))
      .toDF("id", "kind", "payload", "width", "height")
    val f = Multimodal.extractFeatures(junk, 8).collect().head
    assert(f.dec_w == -1 && f.dec_h == -1 && f.features.length == 8)
  }

  test("frame sampling really decodes GIF frames: sums match the formula") {
    import spark.implicits._
    val docs = Seq(2L, 5L, 11L).toDF("doc_id")
    val frames = Multimodal
      .frameSample(Multimodal.syntheticVideos(docs), 3).collect()
    assert(frames.length == 9)
    frames.foreach { fr =>
      val nf = Multimodal.synthFrames(fr.id)
      val w = Multimodal.synthVidW(fr.id); val h = Multimodal.synthVidH(fr.id)
      assert(fr.dec_w == w && fr.dec_h == h, "decoded dims must match")
      assert(fr.frame_idx == fr.sample_i * (nf - 1) / 2, "sampling spread")
      var want = 0L
      for (y <- 0 until h; x <- 0 until w)
        want += Multimodal.frameValue(fr.id, fr.frame_idx, x, y)
      assert(fr.fsum == want, s"frame ${fr.frame_idx} of clip ${fr.id}")
    }
    // first and last frames are always covered
    assert(frames.filter(_.id == 5L).map(_.frame_idx).toSet ==
      Set(0, (Multimodal.synthFrames(5L) - 1) / 2, Multimodal.synthFrames(5L) - 1))
  }

  test("frame sampling marks undecodable payloads instead of crashing") {
    import spark.implicits._
    val junk = Seq((7L, "video", "not a gif".getBytes, 4, 4))
      .toDF("id", "kind", "payload", "width", "height")
    val got = Multimodal.frameSample(junk, 3).collect()
    assert(got.toSeq == Seq(Multimodal.FrameSample(7L, -1, -1, -1, -1, -1L)))
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

  test("resizePixels: payload re-decodes to the exact resample formula") {
    import spark.implicits._
    val docs = (0L until 6L).toDF("doc_id")
    val (dw, dh) = (6, 5)
    val rows = Multimodal
      .resizePixels(Multimodal.syntheticImages(docs), dw, dh)
      .collect()
    rows.foreach { r =>
      val sw = Multimodal.synthW(r.id); val sh = Multimodal.synthH(r.id)
      assert((r.src_w, r.src_h, r.width, r.height) == ((sw, sh, dw, dh)))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth == dw && img.getHeight == dh)
      var gs = 0L
      for (y <- 0 until dh; x <- 0 until dw) {
        val expect = Multimodal.pixelValue(r.id, x * sw / dw, y * sh / dh)
        assert((img.getRGB(x, y) & 0xFF) == expect,
          s"id ${r.id} pixel ($x,$y)")
        gs += expect
      }
      assert(r.gray_sum == gs)
    }
  }

  test("audioResample: payload re-decodes to the exact decimation") {
    import spark.implicits._
    val docs = (0L until 5L).toDF("doc_id")
    val factor = 4
    val rows = Multimodal
      .audioResample(Multimodal.syntheticAudio(docs), factor).collect()
    rows.foreach { r =>
      val n = Multimodal.synthSamples(r.id)
      assert((r.src_rate, r.dst_rate, r.n_in, r.n_out) ==
        ((8000, 2000, n, (n + 3) / 4)))
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      assert(in.getFormat.getSampleRate.toInt == 2000)
      val bytes = in.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      assert(bytes.length / 2 == r.n_out)
      var sum = 0L
      (0 until r.n_out).foreach { j =>
        val expect = Multimodal.sampleValue(r.id, factor * j)
        assert(bb.getShort(2 * j).toInt == expect, s"id ${r.id} sample $j")
        sum += expect
      }
      assert(r.sample_sum == sum)
    }
  }

  test("audioResample marks undecodable payloads") {
    import spark.implicits._
    val junk = Seq((9L, "audio", "not a wav".getBytes, 4, 4))
      .toDF("id", "kind", "payload", "width", "height")
    val r = Multimodal.audioResample(junk, 4).collect().head
    assert(r.src_rate == -1 && r.sample_sum == -1L && r.payload.isEmpty)
  }

  test("resizePixels marks undecodable payloads") {
    import spark.implicits._
    val junk = Seq((9L, "image", "not a png".getBytes, 4, 4))
      .toDF("id", "kind", "payload", "width", "height")
    val r = Multimodal.resizePixels(junk, 6, 5).collect().head
    assert(r.src_w == -1 && r.gray_sum == -1L && r.payload.isEmpty)
  }

  test("resize rewrites metadata only") {
    val r = Multimodal.resize(media, 320, 240)
    val row = r.select("width", "height").head()
    assert(row.getInt(0) == 320 && row.getInt(1) == 240)
    assert(r.columns.toSet == media.columns.toSet)
  }
}
