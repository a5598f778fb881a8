package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.core.AsOfJoin

/** AsOfJoin semantics: inclusive at equal timestamps, greatest-tieBreak
  * among simultaneous right rows, null when nothing precedes, and keys
  * never leak across. */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("matches the latest at-or-before right row per key") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, ts(10)), // after r2 → matches r2
      (101L, 1L, ts(5)),  // equal ts to r2 → inclusive match
      (102L, 1L, ts(1)),  // before everything → null
      (103L, 2L, ts(50))  // other key: only r4 visible
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, 1L, ts(3), 10.0),  // r1
      (2L, 1L, ts(5), 20.0),  // r2
      (3L, 1L, ts(5), 30.0),  // r3: same ts as r2, larger id → wins ties
      (4L, 2L, ts(40), 40.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = AsOfJoin.asof(left, right, "user_id", "ts",
        tieBreak = "event_id", payloadCols = Seq("event_id", "value"),
        prefix = "m_")
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_ => r.getLong(3)), Option(r.get(4)).map(_ => r.getDouble(4))))
      .toMap
    assert(got(100L) == (Some(3L), Some(30.0))) // latest ts wins, tie → id 3
    assert(got(101L) == (Some(3L), Some(30.0))) // inclusive at equal ts
    assert(got(102L) == (None, None))
    assert(got(103L) == (Some(4L), Some(40.0)))
  }

  test("null-time rows never match and are never carried") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, Option(ts(3))),  // before every real view → null match
      (101L, 1L, Option(ts(10))), // matches the real ts-5 view
      (102L, 1L, Option.empty[Timestamp]) // null-time left row → kept, null match
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (9L, 1L, Option.empty[Timestamp], 90.0), // null-time right: invisible
      (8L, 1L, Option(ts(5)), 80.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = AsOfJoin.asof(left, right, "user_id", "ts",
        tieBreak = "event_id", payloadCols = Seq("event_id"), prefix = "m_")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_ => r.getLong(3)))
      .toMap
    assert(got(100L) == None) // NOT the null-time right row
    assert(got(101L) == Some(8L))
    assert(got(102L) == None)
    assert(got.size == 3) // null-time left rows are preserved
  }

  test("forward variant matches the earliest at-or-after right row") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, ts(4)),  // before r1/r2/r3 → earliest after is r1 (ts 5, min id 2? ids below)
      (101L, 1L, ts(5)),  // equal ts → inclusive, smallest id among ts-5 rows
      (102L, 1L, ts(6)),  // after ts-5 rows → null (nothing later)
      (103L, 2L, ts(10))  // other key
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (2L, 1L, ts(5), 20.0),
      (3L, 1L, ts(5), 30.0), // same ts as id 2: smaller id wins forward ties
      (4L, 2L, ts(40), 40.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = AsOfJoin.asofForward(left, right, "user_id", "ts",
        tieBreak = "event_id", payloadCols = Seq("event_id"), prefix = "m_")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_ => r.getLong(3)))
      .toMap
    assert(got(100L) == Some(2L))
    assert(got(101L) == Some(2L)) // inclusive, min-tieBreak resolution
    assert(got(102L) == None)
    assert(got(103L) == Some(4L))
  }

  test("null-key rows follow equi-join semantics, not window grouping") {
    import spark.implicits._
    val left = Seq(
      (100L, Option(1L), ts(10)),          // normal match
      (101L, Option.empty[Long], ts(10))   // null key: kept, unmatched
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (8L, Option(1L), ts(5), 80.0),
      (9L, Option.empty[Long], ts(5), 90.0) // null-key right: invisible
    ).toDF("event_id", "user_id", "ts", "value")
    val got = AsOfJoin.asof(left, right, "user_id", "ts",
        tieBreak = "event_id", payloadCols = Seq("event_id"), prefix = "m_")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_ => r.getLong(3)))
      .toMap
    assert(got(100L) == Some(8L))
    assert(got(101L) == None) // NOT matched to the null-key right row
    assert(got.size == 2)
  }

  test("DATE time columns join without a lossy numeric cast") {
    import spark.implicits._
    val d = (s: String) => java.sql.Date.valueOf(s)
    val left = Seq((100L, 1L, d("2024-03-10")), (101L, 1L, d("2024-01-05")))
      .toDF("event_id", "user_id", "day")
    val right = Seq(
      (1L, 1L, d("2024-02-01"), 10.0),
      (2L, 1L, d("2024-03-01"), 20.0)).toDF("event_id", "user_id", "day", "value")
    val got = AsOfJoin.asof(left, right, "user_id", "day",
        tieBreak = "event_id", payloadCols = Seq("value"), numBuckets = 4)
      .orderBy("event_id").collect()
    assert(got(0).getAs[Double]("asof_value") == 20.0) // Mar 10 → Mar 1
    assert(got(1).isNullAt(got(1).fieldIndex("asof_value"))) // Jan 5 → none
  }

  test("null tieBreak loses equal-timestamp ties in BOTH directions") {
    import spark.implicits._
    val left = Seq((100L, 1L, ts(10))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Some(5L), 1L, ts(10), 1.0),
      (None, 1L, ts(10), 2.0)) // null tieBreak, same timestamp
      .toDF("event_id", "user_id", "ts", "value")
    val back = AsOfJoin.asof(left, right, "user_id", "ts",
      tieBreak = "event_id", payloadCols = Seq("value")).head()
    assert(back.getAs[Double]("asof_value") == 1.0) // greatest tb wins; null loses
    val fwd = AsOfJoin.asofForward(left, right, "user_id", "ts",
      tieBreak = "event_id", payloadCols = Seq("value")).head()
    assert(fwd.getAs[Double]("asof_value") == 1.0) // smallest tb wins; null loses
  }

  test("bucketed carry equals the single-window result on a skewed key") {
    import spark.implicits._
    // one key holds 90% of events (the hot-key shape the bucketing
    // exists for) AND times are bursty (80% of events inside one
    // 3-second spike — quantile boundaries must still spread them);
    // several bucket counts including 1 (the degenerate single-window
    // plan) as the reference
    val rng = new scala.util.Random(7)
    def burstyTs(): java.sql.Timestamp =
      if (rng.nextInt(10) < 8) ts(60L + rng.nextInt(3))
      else ts(rng.nextInt(120).toLong)
    val leftRows = (0 until 400).map { i =>
      val k = if (rng.nextInt(10) < 9) 1L else 1L + rng.nextInt(3)
      (1000L + i, k, burstyTs())
    }
    val rightRows = (0 until 400).map { i =>
      val k = if (rng.nextInt(10) < 9) 1L else 1L + rng.nextInt(3)
      (i.toLong, k, burstyTs(), rng.nextDouble())
    }
    val left = leftRows.toDF("event_id", "user_id", "ts")
    val right = rightRows.toDF("event_id", "user_id", "ts", "value")
    def runAt(buckets: Int, forward: Boolean) = {
      val f = if (forward) AsOfJoin.asofForward _ else AsOfJoin.asof _
      f(left, right, "user_id", "ts", "event_id", Seq("event_id", "value"),
        "m_", buckets)
        .collect()
        .map(r => r.getLong(0) ->
          (Option(r.get(3)).map(_ => r.getLong(3)),
            Option(r.get(4)).map(_ => r.getDouble(4))))
        .toMap
    }
    for (forward <- Seq(false, true)) {
      val single = runAt(1, forward)
      for (buckets <- Seq(7, 64, 1000))
        assert(runAt(buckets, forward) == single,
          s"bucketed ($buckets, forward=$forward) diverged from single-window")
    }
  }
}
