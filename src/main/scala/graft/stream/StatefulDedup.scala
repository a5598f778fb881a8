package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful cross-batch stream deduplication via
  * `flatMapGroupsWithState` — the custom-state half of the streaming
  * surface (the reference has no stateful processing at all; this is the
  * Spark-native capability a change feed needs at scale: exactly-once
  * emission of first-seen keys across microbatches, state partitioned by
  * key across executors).
  *
  * Each group = one dedup key (e.g. user_id, or a content fingerprint).
  * State = smallest event_id already emitted for the key; an incoming
  * batch emits only rows whose key was never seen. Deterministic: within
  * a batch the minimum event_id wins.
  */
object StatefulDedup {

  final case class Seen(minEventId: Long)
  final case class FirstSeen(key: Long, event_id: Long, event_type: String)

  def firstSeenByKey(events: DataFrame, keyCol: String): Dataset[FirstSeen] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("long").as("key"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, String)],
         state: GroupState[Seen]) =>
          if (state.exists) Iterator.empty
          else {
            val first = rows.minBy(_._2) // deterministic within the batch
            state.update(Seen(first._2))
            Iterator(FirstSeen(key, first._2, first._3))
          }
      }
  }
}
