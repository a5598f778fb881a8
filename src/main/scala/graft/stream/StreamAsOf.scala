package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the streaming twin of
  * [[graft.core.AsOfJoin]]: left events are matched with the greatest
  * (time, tieBreak) right event at-or-before their time, carried ACROSS
  * micro-batches in per-key state (one carry row per key, sharded across
  * executors by the group key).
  *
  * Semantics are ARRIVAL-BOUNDED event-time as-of: within a batch rows
  * process in full (t, side, tieBreak) scan order (right-before-left at
  * equal times — the inclusive bound, same as the batch operator), and
  * the carry state is the maximum (t, tieBreak) right row seen so far.
  * A right row arriving LATER than a left event it would have matched
  * cannot rewrite history (append mode), and a late right row older
  * than the standing carry is dropped — the bounded-state trade
  * Structured Streaming's single-value-state design makes; feed the
  * right side in order (the CDC-changelog regime) and the result equals
  * the batch as-of join (pinned by StreamAsOfSpec).
  *
  * Input relation: (k long, t long, side int [0=right,1=left],
  * eid long [tieBreak on right rows, event id on left rows], v double).
  */
object StreamAsOf {
  final case class Ev(k: Long, t: Long, side: Int, eid: Long, v: Double)
  final case class Carry(t: Long, tb: Long, v: Double)
  final case class Enriched(eid: Long, k: Long, t: Long,
      asof_v: Option[Double])

  def enrich(events: DataFrame): Dataset[Enriched] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("k").cast("long"), col("t").cast("long"),
        col("side").cast("int"), col("eid").cast("long"),
        col("v").cast("double"))
      .as[Ev]
      .groupByKey(_.k)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, rows: Iterator[Ev], state: GroupState[Carry]) =>
          // batch-local scan order = the batch operator's window order
          val sorted = rows.toSeq.sortBy(e => (e.t, e.side, e.eid))
          var cur = state.getOption
          val out = Seq.newBuilder[Enriched]
          for (e <- sorted) {
            if (e.side == 0) {
              if (cur.forall(c => (c.t < e.t) ||
                  (c.t == e.t && c.tb < e.eid)))
                cur = Some(Carry(e.t, e.eid, e.v))
            } else {
              out += Enriched(e.eid, k, e.t,
                cur.filter(_.t <= e.t).map(_.v))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
