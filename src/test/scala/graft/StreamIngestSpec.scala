package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.VectorDb
import graft.stream.ChangeFeed

/** Streaming ingest into the collection store — the reference's
  * StreamingBinaryWriter (binary_persistence.py:212-274) as a Structured
  * Streaming foreachBatch sink: each microbatch upserts into the
  * parquet-backed collection, so restarts/retries are idempotent by key.
  */
class StreamIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("foreachBatch sink upserts each microbatch into a collection") {
    val root = Files.createTempDirectory("graft_ingest").toString
    val db = new VectorDb(spark, root)
    val coll = db.createCollection("events_sink", dimensions = 0, metric = "none")

    val stream = ChangeFeed.readStream(spark, SparkTestSession.sf)
      .select(concat(lit("e:"), col("event_id")).as("id"),
        col("event_type"), col("value"))

    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        coll.upsert(batch)
      }
      .start()
    try {
      q.processAllAvailable()
      val expected = ChangeFeed
        .matched(core.Tables.events(spark, SparkTestSession.sf),
          ChangeFeed.Subscription())
        .count()
      assert(coll.count() == expected)
      // idempotent under reprocessing: upserting the batch again does
      // not duplicate rows (retry semantics)
      coll.upsert(core.Tables.events(spark, SparkTestSession.sf)
        .select(concat(lit("e:"), col("event_id")).as("id"),
          col("event_type"), col("value")))
      assert(coll.count() == expected)
    } finally {
      q.stop()
      db.dropCollection("events_sink")
    }
  }
}
