package graft.stream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.filter.Pred

/** Change-feed / event-stream operators. The reference's realtime layer
  * (jcolano/fastpyvectordb `realtime.py`) is a pub/sub CDC feed: typed
  * events, per-subscriber predicates (collection + event-type set +
  * metadata equality filter, `realtime.py:99-118`), and a fixed-size
  * history replay (`:154-160`). Spark-native mapping:
  *
  *  - the feed is a Structured Streaming DataFrame over the events table
  *    (file source here; Kafka/CDC source in production — same plan),
  *  - a Subscription compiles to one Column predicate, applied identically
  *    to the stream and to batch backfills,
  *  - history replay = orderBy(ts desc).limit(n) over the batch table,
  *  - windowed aggregation (tumbling/sliding + watermark) is the
  *    Spark-native extension the reference lacks (no event-time windows,
  *    SURVEY.md §2.10) — flagged additive.
  *
  * Every aggregation below works unchanged on the streaming DF (verified
  * in StreamSpec via a memory sink); the catalog exposes the batch form so
  * the DuckDB oracle can replay identical results.
  */
object ChangeFeed {

  /** On-disk schema shape; the `ts` physical type has varied across
    * testdata generations (raw nanos long vs TIMESTAMP(MICROS)-NTZ), so
    * [[readStream]] probes the footer and normalizes via
    * [[graft.core.Tables.normalizeTs]]. */
  def rawSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** Streaming source over the events parquet (one file = one microbatch
    * here; a directory of arriving files at scale). The file source needs
    * a directory path, so glob-filter the events file out of the sf dir.
    */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // one footer read (driver-side, no data scan) to learn this
    // generation's physical ts type — the stream schema must match it.
    // A define-before-data caller (stream declared on an EXISTING but
    // still-empty dir, files arrive later) has no footer to probe: fall
    // back to the raw-nanos LongType the generator historically wrote —
    // the pre-probe static schema (ADVICE r7). The check is an explicit
    // file-existence probe, NOT a broad AnalysisException catch: a
    // nonexistent/misspelled dir must keep failing fast at definition
    // time, where the configuration error is, not at query start.
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val eventsFile = new org.apache.hadoop.fs.Path(dir, "events.parquet")
    val tsType =
      if (fs.exists(eventsFile))
        spark.read
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .schema("ts").dataType
      else if (fs.exists(dirPath)) LongType // define-before-data
      else throw new IllegalArgumentException(
        s"ChangeFeed.readStream: directory does not exist: $dir")
    graft.core.Tables.normalizeTs(
      spark.readStream
        .schema(rawSchema(tsType))
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Per-subscriber match predicate (reference `Subscription.matches`):
    * empty eventTypes = all types; optional metadata predicate from the
    * filter DSL. */
  final case class Subscription(
      eventTypes: Seq[String] = Nil,
      predicate: Option[Pred] = None) {
    def column: Column = {
      val t: Column =
        if (eventTypes.isEmpty) lit(true)
        else col("event_type").isin(eventTypes: _*)
      predicate.map(p => t && p.column).getOrElse(t)
    }
  }

  def matched(events: DataFrame, sub: Subscription): DataFrame =
    events.filter(sub.column)

  /** Tumbling-window counts/sums per event type; window start as epoch
    * seconds so the oracle compares integers. Works on stream + batch. */
  def tumblingCounts(events: DataFrame, window: String): DataFrame =
    events
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("wstart"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window (window, slide) overall counts. */
  def slidingCounts(events: DataFrame, window: String, slide: String): DataFrame =
    events
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("wstart"),
        col("n"), col("sum_value"))

  /** Late-joiner history replay: last n events (reference replays 10). */
  def historyTail(events: DataFrame, n: Int): DataFrame =
    events
      .select(col("event_id"), unix_timestamp(col("ts")).as("ts_sec"),
        col("event_type"), col("value"))
      .orderBy(desc("ts_sec"), desc("event_id"))
      .limit(n)

  /** The reference EventBus's bounded buffer, replayed for a set of late
    * joiners: the bus keeps at most `capacity` events (drop-OLDEST on
    * overflow, `realtime.py:265-275`) and hands a joiner the last
    * `replayN` of them (`realtime.py:154-160`) — so a joiner receives
    * `min(replayN, capacity)` events, and fewer only when the buffer
    * hasn't filled yet at its join time. `joiners` = (joiner_id, jt_sec)
    * — tiny, broadcast; per-joiner top-k is a rank window partitioned by
    * joiner. At scale, bound the scan with a time floor (jt − the bus's
    * retention horizon) before the join so the rank never sorts deep
    * history that can't be replayed anyway. */
  def boundedReplay(events: DataFrame, capacity: Int, replayN: Int,
      joiners: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val served = math.min(replayN, capacity)
    val w = Window.partitionBy("joiner_id")
      .orderBy(desc("ts_sec"), desc("event_id"))
    events
      .select(col("event_id"), unix_timestamp(col("ts")).as("ts_sec"),
        col("event_type"))
      .join(broadcast(joiners), col("ts_sec") <= col("jt_sec"))
      .withColumn("replay_rank", row_number().over(w))
      .filter(col("replay_rank") <= served)
      .select(col("joiner_id"), col("replay_rank"), col("event_id"),
        col("ts_sec"), col("event_type"))
  }
}
