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

  final case class FirstDoc(fp: Long, doc_id: Long)

  /** Document-stream form: emit the first document seen for each content
    * fingerprint (min doc_id within a batch, first batch wins across
    * batches) — the streaming half of corpus dedup: exact-dup drop at
    * ingest time, state sharded by fingerprint across executors. */
  def firstDocByFingerprint(docs: DataFrame, fpCol: String,
      idCol: String): Dataset[FirstDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(fpCol).cast("long").as("fp"),
        col(idCol).cast("long").as("doc_id"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fp: Long, rows: Iterator[(Long, Long)], state: GroupState[Seen]) =>
          if (state.exists) Iterator.empty
          else {
            val first = rows.minBy(_._2)
            state.update(Seen(first._2))
            Iterator(FirstDoc(fp, first._2))
          }
      }
  }

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
