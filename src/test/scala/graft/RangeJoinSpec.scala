package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.core.RangeJoin

/** RangeJoin.backwardBand: [t−Δ, t) boundary semantics, key isolation,
  * and the plan stays an equi-join (never a per-key cartesian). */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("band boundaries are [t-delta, t) and keys never mix") {
    import spark.implicits._
    val left = Seq((1L, ts(100), 100L)).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(40), 1L),   // exactly t-delta → included
      (1L, ts(99), 2L),   // inside → included
      (1L, ts(100), 3L),  // equal to t → EXCLUDED (strict upper bound)
      (1L, ts(39), 4L),   // before the band → excluded
      (2L, ts(99), 5L)    // other key → excluded
    ).toDF("user_id", "ts", "event_id")
    val q = RangeJoin.backwardBand(left, right, "user_id", "ts", "ts",
      deltaSec = 60, lCols = Seq("user_id", "event_id"),
      rCols = Seq("event_id"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"), plan)
    val got = q.collect().map(_.getLong(2)).sorted.toSeq
    assert(got == Seq(1L, 2L))
  }
}
