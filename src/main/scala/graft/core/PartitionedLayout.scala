package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned table layout — the other storage-side scan
  * lever (with [[BucketedLayout]]'s bucketing) a 100 TB events table
  * needs: partition the write by a low-cardinality predicate column and
  * a query filtering on it never OPENS the non-matching partitions
  * (directory-level pruning, before any footer or row group is read —
  * `PartitionFilters` on the scan, not a data filter). At 100 TB with
  * daily/type partitions this is the difference between scanning 100 TB
  * and scanning one partition's slice; locally it is gated by plan
  * shape, not wall clock.
  *
  * The layout artifact lives under the index-store root keyed by the
  * source fingerprint (auto-fresh when the source regenerates — same
  * contract as the persistent retrieval indexes).
  */
object PartitionedLayout {
  /** Path of the partitioned events copy for `dir`, fingerprint-keyed. */
  private def layoutPath(spark: SparkSession, dir: String): String = {
    val fp = graft.index.IndexStore.fingerprint(
      spark, Seq(s"$dir/events.parquet"))
    // `_partitioned2`: fresh root for the r9 publish protocol (ready
    // marker inside the dir) — see [[BucketedLayout.layoutRoot]]
    s"${graft.index.IndexStore.root}/_partitioned2/" +
      s"${graft.index.IndexStore.slug(dir)}/events_$fp"
  }

  /** Ensure the event_type-partitioned events copy exists; returns its
    * path. The write is the one-time layout cost being amortized.
    * Cross-JVM safe via [[LayoutPublish]] (VERDICT r8 #1): built into a
    * tmp dir, atomically renamed into place (a concurrent builder adopts
    * the winner's complete copy), and stale-fingerprint generations of a
    * regenerated source are grace-period garbage-collected instead of
    * deleted under a possibly-live reader. */
  def ensure(spark: SparkSession, dir: String): String = synchronized {
    graft.index.IndexStore.gcLegacyRoots(spark)
    val path = layoutPath(spark, dir)
    val p = new Path(path)
    LayoutPublish.publish(spark, p) { tmp =>
      Tables.events(spark, dir)
        .write.partitionBy("event_type").parquet(tmp.toString)
    }
    LayoutPublish.gcStale(spark, p.getParent, "events_", p.getName)()
    path
  }

  /** The pruned scan the layout exists for: one event type's per-user
    * value rollup. Throws unless the filter prunes at the PARTITION
    * level (directory pruning on the scan — non-matching partitions are
    * never opened). */
  def clickRollup(spark: SparkSession, dir: String): DataFrame = {
    val path = ensure(spark, dir)
    val out = spark.read.parquet(path)
      .filter(col("event_type") === "click")
      .groupBy(pmod(col("user_id"), lit(10)).as("user_bucket"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("total_value"))
      .orderBy("user_bucket")
    val plan = out.queryExecution.executedPlan.toString
    require(
      plan.contains("PartitionFilters:") &&
        """PartitionFilters: \[[^\]]*event_type[^\]]*click""".r
          .findFirstIn(plan).isDefined,
      s"partition_pruning: event_type filter did not reach the " +
        s"partition level:\n$plan")
    require(
      !"""PushedFilters: \[[^\]]*event_type""".r.findFirstIn(plan).isDefined,
      s"partition_pruning: event_type leaked into the DATA filters — " +
        s"the scan would open every partition:\n$plan")
    out
  }
}
