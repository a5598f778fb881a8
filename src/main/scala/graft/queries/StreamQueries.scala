package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.filter.Lt
import graft.stream.ChangeFeed
import graft.stream.ChangeFeed.Subscription

/** Event-stream catalog queries in their batch form (the StreamSpec test
  * proves the same plans run as Structured Streaming with a watermark).
  */
object StreamQueries {
  val qs: Seq[Q] = Seq(
    Q(
      "events_tumbling",
      (s, dir) =>
        ChangeFeed.tumblingCounts(Tables.events(s, dir), "1 hour")
          .orderBy("wstart", "event_type"),
      Some(
        """SELECT floor(epoch(date_trunc('hour', ts)))::BIGINT AS wstart,
          |       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
          |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      bench = true
    ),
    Q(
      "events_sliding",
      (s, dir) =>
        ChangeFeed.slidingCounts(Tables.events(s, dir), "1 hour", "30 minutes")
          .orderBy("wstart"),
      // Each event lands in exactly window/slide = 2 sliding windows whose
      // starts are the two 30-min grid points in (ts-1h, ts].
      Some(
        """WITH b AS (
          |  SELECT (floor(epoch(ts) / 1800) * 1800 - i * 1800)::BIGINT AS wstart,
          |         value
          |  FROM events, unnest([0, 1]) t(i))
          |SELECT wstart, count(*) AS n, round(sum(value), 2) AS sum_value
          |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    Q(
      "events_subscription",
      (s, dir) =>
        ChangeFeed.matched(Tables.events(s, dir),
            Subscription(Seq("click", "purchase"), Some(Lt("user_id", 100L))))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
          .orderBy("event_type"),
      Some(
        """SELECT event_type, count(*) AS n, round(avg(value), 4) AS avg_value
          |FROM events
          |WHERE event_type IN ('click', 'purchase') AND user_id < 100
          |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    Q(
      "events_history_tail",
      (s, dir) => ChangeFeed.historyTail(Tables.events(s, dir), 10),
      Some(
        """SELECT event_id, floor(epoch(ts))::BIGINT AS ts_sec, event_type, value
          |FROM events
          |ORDER BY ts_sec DESC, event_id DESC LIMIT 10""".stripMargin)
    )
  )
}
