package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.filter.Lt
import graft.stream.ChangeFeed
import graft.stream.ChangeFeed.Subscription

/** Proves the change-feed plans actually run as Structured Streaming:
  * file source → watermark → windowed agg / subscription filter → memory
  * sink, then compares against the batch run of the same plan.
  */
class StreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("tumbling window agg over the stream matches the batch result") {
    val stream = ChangeFeed.readStream(spark, sf)
      .withWatermark("ts", "1 hour")
    val q = ChangeFeed.tumblingCounts(stream, "1 hour")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_counts")
        .orderBy("wstart", "event_type").collect()
      val batch = ChangeFeed.tumblingCounts(Tables.events(spark, sf), "1 hour")
        .orderBy("wstart", "event_type").collect()
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("subscription filter applies identically on the stream") {
    val sub = Subscription(Seq("error"), Some(Lt("user_id", 50L)))
    val q = ChangeFeed.matched(ChangeFeed.readStream(spark, sf), sub)
      .writeStream.format("memory").queryName("sub_matched")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sub_matched").count()
      val batch = ChangeFeed.matched(Tables.events(spark, sf), sub).count()
      assert(streamed == batch)
      assert(batch > 0)
    } finally q.stop()
  }

  test("stateful dedup emits exactly one first-seen row per key") {
    val q = graft.stream.StatefulDedup
      .firstSeenByKey(ChangeFeed.readStream(spark, sf), "user_id")
      .writeStream.format("memory").queryName("first_seen")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("first_seen").collect()
      val keys = rows.map(_.getLong(0))
      assert(keys.length == keys.distinct.length, "one row per key")
      // first-seen = the minimum event_id per user in the batch source
      val expected = Tables.events(spark, sf)
        .groupBy("user_id").agg(org.apache.spark.sql.functions.min("event_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally q.stop()
  }

  test("native session windows: streamed finalized sessions ⊆ batch sessions") {
    val gap = "30 minutes"
    val stream = ChangeFeed.readStream(spark, sf).withWatermark("ts", "1 minute")
    val q = stream
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .count()
      .selectExpr("user_id", "unix_timestamp(session_window.start) as ws", "count")
      .writeStream.format("memory").queryName("sess_win")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess_win").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // session_window works identically on the batch table
      val batch = Tables.events(spark, sf)
        .groupBy(session_window(col("ts"), gap), col("user_id"))
        .count()
        .selectExpr("user_id", "unix_timestamp(session_window.start) as ws", "count")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed.nonEmpty)
      assert(streamed.subsetOf(batch),
        "append mode must emit only finalized sessions, all present in batch")
      val nUsers = batch.map(_._1).size
      assert(streamed.size >= batch.size - nUsers,
        "at most the last open session per user may be unemitted")
    } finally q.stop()
  }

  test("subscription with empty type set matches all types") {
    val sub = Subscription(Nil, None)
    val n = ChangeFeed.matched(Tables.events(spark, sf), sub).count()
    assert(n == Tables.events(spark, sf).count())
  }

  test("readStream: define-before-data falls back, missing dir fails fast (ADVICE r7)") {
    // an EXISTING but still-empty directory (files arrive later) must
    // define a stream (legacy LongType footer fallback) …
    val empty = java.nio.file.Files
      .createTempDirectory("graft_stream_empty").toString
    val s = ChangeFeed.readStream(spark, empty)
    assert(s.isStreaming && s.columns.contains("ts"))
    // … while a nonexistent/misspelled directory is a configuration
    // error and must keep throwing AT DEFINITION TIME, not at query start
    val ex = intercept[IllegalArgumentException] {
      ChangeFeed.readStream(spark, s"$empty/does_not_exist")
    }
    assert(ex.getMessage.contains("does not exist"))
  }
}
