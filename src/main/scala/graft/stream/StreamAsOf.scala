package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the streaming twin of
  * [[graft.core.AsOfJoin]]: left events are matched with the greatest
  * (time, tieBreak) right event at-or-before their time, with per-key
  * state carried across micro-batches.
  *
  * OUT-OF-ORDER SAFE: rows are buffered per key by EVENT time and a left
  * event is emitted only once the watermark reaches its timestamp — at
  * that point no row that could change its match is still admissible
  * (the engine drops input at or below the watermark for event-time-
  * timeout state ops), so arrival order inside the allowed lateness
  * cannot mis-enrich. This replaces an arrival-order design whose single
  * carry let one late right row silently enrich subsequent lefts with
  * stale history.
  *
  * State per key is bounded by the lateness window, not the stream:
  * right rows at or behind the watermark compact into ONE carry row
  * (every still-buffered left has `lt·1000 ≥ wm ≥ rt·1000`, so only the
  * maximum such right can ever win), and buffered lefts drain as the
  * watermark advances — emission is driven by `EventTimeTimeout`, so a
  * key with no further traffic still flushes once the GLOBAL watermark
  * moves. Equal-time semantics match the batch operator: `right.t <=
  * left.t` inclusive, ties to the greatest tieBreak.
  *
  * Lateness trade: a row more than `lateness` behind the stream's max
  * event time is dropped — the standard Structured Streaming contract,
  * in place of the reference's unbounded re-sortable history. A left
  * event is only emitted once the watermark passes it, so a sink sees
  * nothing for event times the watermark has not yet cleared (tests
  * push a high-time sentinel row to flush).
  *
  * Input relation: (k long, t long [event time, epoch seconds], side int
  * [0=right,1=left], eid long [tieBreak on right rows, event id on left
  * rows], v double).
  */
object StreamAsOf {
  final case class Ev(k: Long, t: Long, side: Int, eid: Long, v: Double)
  final case class EvT(k: Long, t: Long, side: Int, eid: Long, v: Double,
      ts: java.sql.Timestamp)
  final case class Carry(t: Long, tb: Long, v: Double)
  final case class Buf(lefts: Seq[Ev], rights: Seq[Carry],
      carry: Option[Carry])
  final case class Enriched(eid: Long, k: Long, t: Long,
      asof_v: Option[Double])

  private def better(a: Carry, b: Carry): Carry =
    if (b.t > a.t || (b.t == a.t && b.tb > a.tb)) b else a

  def enrich(events: DataFrame, lateness: String = "0 seconds")
      : Dataset[Enriched] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("k").cast("long"), col("t").cast("long"),
        col("side").cast("int"), col("eid").cast("long"),
        col("v").cast("double"))
      .withColumn("ts", timestamp_seconds(col("t")))
      .withWatermark("ts", lateness)
      .as[EvT]
      .groupByKey(_.k)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step _)
  }

  /** One micro-batch step for one key — named (not an inline lambda) so
    * StreamAsOfSpec can drive it with a TestGroupState and pin the state
    * bound directly (dormant-key compaction, VERDICT r7 #3). */
  private[graft] def step(k: Long, rows: Iterator[EvT],
      state: GroupState[Buf]): Iterator[Enriched] = {
    val wm = state.getCurrentWatermarkMs()
    val prev = state.getOption.getOrElse(Buf(Nil, Nil, None))
    // defensive late filter, matching the engine's own INCLUSIVE
    // drop (rows with ts <= wm are discarded before a stateful op
    // under event-time timeout — verified empirically: a t=0 row
    // dies at the initial watermark 0): correctness here must not
    // depend on that plan detail, because a late row reaching the
    // buffer could emit against compacted (hence wrong) state
    val incoming = rows.filter(_.t * 1000L > wm).toSeq
    val rights = prev.rights ++ incoming.filter(_.side == 0)
      .map(e => Carry(e.t, e.eid, e.v))
    val lefts = prev.lefts ++ incoming.filter(_.side == 1)
      .map(e => Ev(e.k, e.t, e.side, e.eid, e.v))
    // a left AT the watermark is safe to emit: any future right has
    // rt·1000 > wm ≥ lt·1000, so it cannot tie or precede the left
    val (ready, pending) = lefts.partition(_.t * 1000L <= wm)
    val out = ready.sortBy(e => (e.t, e.eid)).map { e =>
      // prev.carry needs no time filter: it folds rights already at
      // or below an older watermark, and every ready left was
      // admitted strictly above that watermark
      val cands = prev.carry.iterator ++
        rights.iterator.filter(_.t <= e.t)
      val best = cands.reduceOption(better)
      Enriched(e.eid, k, e.t, best.map(_.v))
    }
    val (oldR, newR) = rights.partition(_.t * 1000L <= wm)
    val carry = (prev.carry.iterator ++ oldR.iterator)
      .reduceOption(better)
    state.update(Buf(pending, newR, carry))
    if (pending.nonEmpty) {
      // wake this key once the watermark can clear its earliest
      // pending left (registration must be strictly above wm)
      val due = pending.map(_.t * 1000L).min
      state.setTimeoutTimestamp(math.max(due, wm + 1))
    } else if (newR.nonEmpty) {
      // no pending lefts but buffered rights: without a timeout a
      // DORMANT key would hold the full lateness-window right
      // buffer until new traffic arrives, instead of the
      // documented one-row carry — wake at the next watermark
      // advance so the rights compact into `carry`
      state.setTimeoutTimestamp(wm + 1)
    }
    out.iterator
  }
}
