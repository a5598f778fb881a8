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
    s"${graft.index.IndexStore.root}/_partitioned/" +
      s"${graft.index.IndexStore.slug(dir)}/events_$fp"
  }

  /** Ensure the event_type-partitioned events copy exists; returns its
    * path. The write is the one-time layout cost being amortized. */
  def ensure(spark: SparkSession, dir: String): String = synchronized {
    val path = layoutPath(spark, dir)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path, "_SUCCESS"))) {
      // a regenerated source changes the fingerprint — delete stale
      // sibling events_* layouts (this dir is owned by the layout) so
      // regens don't accumulate orphaned full copies of the table
      val parent = p.getParent
      if (fs.exists(parent))
        fs.listStatus(parent)
          .filter(_.getPath.getName.startsWith("events_"))
          .foreach(st => fs.delete(st.getPath, true))
      Tables.events(spark, dir)
        .write.partitionBy("event_type").parquet(path)
    }
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
