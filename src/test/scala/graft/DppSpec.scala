package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning over the PartitionedLayout artifact: when
  * the partition column is only constrained THROUGH a join (the filter
  * lives on the dim side), Spark injects a runtime subquery filter into
  * the fact scan's PartitionFilters — at 100 TB this is what keeps a
  * star-join from scanning every partition when the predicate arrives
  * via a dimension table.
  */
class DppSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("a dim-side filter prunes the fact scan's partitions at runtime") {
    import spark.implicits._
    val path = core.PartitionedLayout.ensure(spark, sf)
    val fact = spark.read.parquet(path)
    // the dim must be a SOURCE-backed relation: a filter over an
    // in-memory Seq collapses into a pre-filtered LocalRelation during
    // optimization, and with no Filter node left on the dim side the
    // PartitionPruning rule sees no selective predicate to push
    val dimPath = java.nio.file.Files
      .createTempDirectory("graft_dpp_dim").toString
    // the predicate must be one the rule's isLikelySelective accepts —
    // a bare boolean attribute is not (and `= true` boolean-simplifies
    // back to one); a string equality is
    Seq(("click", "paid"), ("view", "paid"), ("purchase", "free"),
      ("signup", "free"), ("error", "free"))
      .toDF("event_type", "tier")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    try {
      val q = fact.join(dim, Seq("event_type"))
        .filter(col("tier") === "paid")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning in the fact scan:\n$plan")
      // and the pruned plan returns the flat answer
      val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exp = core.Tables.events(spark, sf)
        .filter(col("event_type").isin("click", "view"))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == exp && got.nonEmpty)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dimPath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("the catalog's tierRollup plans DPP and equals the plain rollup") {
    // the gate inside tierRollup throws if the runtime partition filter
    // is missing, so reaching collect() proves the plan shape; equality
    // against the unpartitioned scan proves layout + DPP never move the
    // answer (the catalog oracle re-pins this against DuckDB)
    val got = core.PartitionedLayout.tierRollup(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val exp = core.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("total_value"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.sameElements(exp) && got.nonEmpty)
  }
}
