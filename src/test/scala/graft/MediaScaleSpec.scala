package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.media.Multimodal

/** Pins the finite-hash-space geometry behind `media_card`'s decade-scale
  * behavior (VERDICT r12 #1): the synthetic phash corpus' aHash values
  * live in a FIXED space of exactly 14,976 hashes that repeats with
  * period 15,120 in the base id, independent of corpus size. Identical-
  * hash clusters therefore grow LINEARLY with rows and the verified
  * near-dup pair count QUADRATICALLY between sub-cap scales (measured:
  * 8,913 pairs at sf0.1 / 5k docs → 801,124 at the key-shifted 10×
  * corpus — ~90× output for 10× rows), so a wall ratio that tracks
  * below the work ratio is the plan scaling SUB-linearly per unit of
  * output, not a plan defect. The bench's decade probe reports exactly
  * that comparison (`work` section via [[ScaleDiag]]); this spec pins
  * the corpus facts the argument rests on, so a formula change that
  * breaks them fails a test instead of silently invalidating the
  * artifact's explanation.
  *
  * Everything here is computed at the formula level (the same
  * `phashBaseValue`/`aHash` the PNG pipeline encodes and decodes;
  * MediaSpec separately pins that the decode path reproduces the
  * formula bit-for-bit).
  */
class MediaScaleSpec extends AnyFunSuite {
  /** aHash of base image `b` rendered at exposure `parity` (the corpus
    * maps doc ids to (base = id/2, parity = id%2)). */
  private def hashOf(b: Long, parity: Int = 0): (Long, Long) = {
    val w = Multimodal.synthW(b); val h = Multimodal.synthH(b)
    val gray = Array.tabulate(w * h)(i =>
      Multimodal.phashBaseValue(b, i % w, i / w) + 40 * parity)
    Multimodal.aHash(gray, w, h)
  }

  /** Every input to the hash repeats in the base id with this period:
    * dims (b%16, b%12) and the pixel formula's moduli (b*31 % 216,
    * b%5, b%3, b%7) ⇒ lcm(16, 12, 216, 5, 3, 7). */
  private val Period = 15120L

  test("aHash is invariant to the parity exposure offset (+40 to every pixel)") {
    // adding a constant c shifts every block mean and the global mean by
    // c, and (bs + c·bn)·n > (gs + c·n)·bn ⟺ bs·n > gs·bn — so both
    // renders of a base image land in one identical-hash cluster
    (0L until 500L).foreach { b =>
      assert(hashOf(b, 0) == hashOf(b, 1), s"base $b")
    }
  }

  test("the corpus' aHash is periodic in the base id with period 15120") {
    val probe = (0L until 300L) ++ Seq(1234L, 7777L, 14999L, 15119L)
    probe.foreach { b =>
      assert(hashOf(b) == hashOf(b + Period), s"base $b (+1 period)")
      assert(hashOf(b) == hashOf(b + 7 * Period), s"base $b (+7 periods)")
    }
  }

  test("the hash space is finite: exactly 14,976 distinct values, saturating") {
    val one = (0L until Period).map(hashOf(_)).toSet
    assert(one.size == 14976,
      s"distinct hashes over one period drifted: ${one.size}")
    // corpus-size independence: a second period adds NOTHING — from
    // ~30k docs on, every new row lands in an existing identical-hash
    // cluster, which is what makes doc-level pair counts quadratic
    // while the distinct-hash join input (phashNearDupPairCount's
    // banded frame) stays CONSTANT
    val sample = (0L until 2000L).map(b => hashOf(b + Period))
    assert(sample.forall(one.contains),
      "a hash outside the first period's value space appeared")
  }

  test("no band bucket ever exceeds the guard cap in DISTINCT hashes") {
    // phashNearDupPairCount is exact only while every (band, value)
    // bucket holds ≤ DefaultCap DISTINCT hashes (its r14 guard throws
    // otherwise). On the synthetic corpus the banded frame is built from
    // the distinct-hash set, which SATURATES at the 14,976-value space —
    // so the worst-case bucket at ANY corpus size is the full-space
    // bucket computed here. Band values mirror the query exactly:
    // Spark's % is Java remainder and `div` truncates toward zero, both
    // matching Scala Long ops.
    val one = (0L until Period).map(hashOf(_)).toSet
    val maxBucket = one.toSeq
      .flatMap { case (lo, hi) =>
        Seq((0, lo % 65536L), (1, lo / 65536L),
          (2, hi % 65536L), (3, hi / 65536L))
      }
      .groupBy(identity).valuesIterator.map(_.size).max
    assert(maxBucket <= graft.dedup.BucketGuard.DefaultCap,
      s"saturated band bucket holds $maxBucket distinct hashes > cap " +
        s"${graft.dedup.BucketGuard.DefaultCap} — the exact-count guard " +
        "in phashNearDupPairCount would fire on this corpus")
  }
}
