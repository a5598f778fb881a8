package graft

import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import graft.core.AsOfJoin

/** Differential test: random event histories (hot keys, bursty times,
  * duplicate timestamps, null keys/times/tieBreaks) joined with the
  * bucketed as-of operator vs a trivial per-row in-memory reference, in
  * both directions and across bucket counts.
  */
class AsOfPropSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private case class L(eid: Long, k: Option[Long], t: Option[Long])
  private case class Rr(eid: Option[Long], k: Option[Long], t: Option[Long],
      v: Double)

  /** Reference semantics: match the right row with greatest (t, tb) ≤
    * left t (backward) or smallest ≥ (forward); null key/time on either
    * side never matches; null tieBreak loses ties in both directions. */
  private def expected(ls: Seq[L], rs: Seq[Rr], forward: Boolean)
      : Map[Long, Option[Double]] =
    ls.map { l =>
      val m = (l.k, l.t) match {
        case (Some(k), Some(t)) =>
          val cand = rs.filter(r => r.k.contains(k) && r.t.isDefined &&
            (if (forward) r.t.get >= t else r.t.get <= t))
          if (cand.isEmpty) None
          else Some {
            // ties resolve to greatest tb backward / smallest forward,
            // with null tb at the losing extreme
            val tbOf = (r: Rr) => r.eid.getOrElse(
              if (forward) Long.MaxValue else Long.MinValue + 1)
            val best =
              if (forward) cand.minBy(r => (r.t.get, tbOf(r)))
              else cand.maxBy(r => (r.t.get, tbOf(r)))
            best.v
          }
        case _ => None
      }
      l.eid -> m
    }.toMap

  test("random histories match the reference in both directions") {
    import spark.implicits._
    val rnd = new Random(11)
    for (trial <- 1 to 3) {
      def key() = if (rnd.nextDouble() < 0.05) None
        else Some(if (rnd.nextDouble() < 0.6) 1L else rnd.nextInt(4).toLong)
      def time() = if (rnd.nextDouble() < 0.05) None
        else Some(if (rnd.nextDouble() < 0.5) (50 + rnd.nextInt(4)).toLong
          else rnd.nextInt(200).toLong)
      val ls = (0 until 150).map(i => L(i.toLong, key(), time()))
      val rsRaw = (0 until 150).map(i => Rr(
        if (rnd.nextDouble() < 0.1) None else Some(i.toLong),
        key(), time(), rnd.nextInt(1000).toDouble))
      // two NULL-tieBreak rows on the same (key, time) are genuinely
      // order-unpinned in BOTH the operator and any reference (no total
      // order exists) — keep at most one per (key, time) so every
      // generated case has a well-defined answer
      val rs = rsRaw.zipWithIndex.filter { case (r, i) =>
        r.eid.isDefined || !rsRaw.take(i).exists(p =>
          p.eid.isEmpty && p.k == r.k && p.t == r.t)
      }.map(_._1)
      val left = ls.map(l => (l.eid, l.k, l.t)).toDF("eid", "k", "t")
      val right = rs.map(r => (r.eid, r.k, r.t, r.v))
        .toDF("eid", "k", "t", "v")
      for (forward <- Seq(false, true); buckets <- Seq(1, 5)) {
        val got = (if (forward)
          AsOfJoin.asofForward(left, right, "k", "t", tieBreak = "eid",
            payloadCols = Seq("v"), numBuckets = buckets)
        else
          AsOfJoin.asof(left, right, "k", "t", tieBreak = "eid",
            payloadCols = Seq("v"), numBuckets = buckets))
          .collect()
          .map(r => r.getLong(r.fieldIndex("eid")) ->
            (if (r.isNullAt(r.fieldIndex("asof_v"))) None
             else Some(r.getDouble(r.fieldIndex("asof_v")))))
          .toMap
        val want = expected(ls, rs, forward)
        assert(got == want,
          s"trial=$trial forward=$forward buckets=$buckets: " +
            got.toSeq.sortBy(_._1).zip(want.toSeq.sortBy(_._1))
              .filter(p => p._1 != p._2).take(5).toString)
      }
    }
  }

  test("tiny hot-key input still splits into >1 bucket (sample fallback, VERDICT r7 #4)") {
    import spark.implicits._
    // 20 events, ALL on one key: a fixed-seed 5% sample of 20 rows
    // yields at most a boundary or two — without the unsampled fallback
    // the bucketing collapses to one bucket and the hot key serializes
    // (answer unchanged, parallelism gone). The fallback must produce
    // full quantile boundaries from the unsampled scan.
    val ts = (1 to 20).map(_.toDouble).toDF("__td")
    val bounds = AsOfJoin.bucketBounds(ts, numBuckets = 8)
    assert(bounds.size >= 2,
      s"tiny input collapsed to ${bounds.size + 1} bucket(s): $bounds")
    // and the operator's answer on that input is unaffected by the
    // bucketing (monotone-bucketing invariance at default numBuckets)
    val left = (1 to 20).map(i => (i.toLong, 1L, i.toLong))
      .toDF("eid", "k", "t")
    val right = (1 to 20).map(i => (100L + i, 1L, i.toLong, i.toDouble))
      .toDF("eid", "k", "t", "v")
    val got = AsOfJoin.asof(left, right, "k", "t", tieBreak = "eid",
        payloadCols = Seq("v"))
      .collect()
      .map(r => r.getLong(r.fieldIndex("eid")) ->
        r.getDouble(r.fieldIndex("asof_v"))).toMap
    assert(got == (1 to 20).map(i => i.toLong -> i.toDouble).toMap)
  }
}
