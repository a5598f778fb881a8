package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins — the pre-shuffle layout a repeatedly-joined
  * 100 TB fact table should live in: both sides bucketed by the join key
  * at write time join with NO exchange on either side (the shuffle was
  * paid once, at layout time, and amortizes over every later join).
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("tables bucketed on the join key join without a shuffle") {
    // managed tables land in the session's default warehouse; DROP TABLE
    // below removes their files (warehouse.dir is a static conf)
    val orders = core.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = core.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at test scale the dim side auto-broadcasts (also exchange-free);
      // disable it so the plan demonstrates the BUCKETED sort-merge path
      // a fact⋈fact join takes at 100 TB
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself runs exchange-free: the only Exchange in the plan
      // belongs to the groupBy ABOVE the join, never below it
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan)
      assert(!plan.substring(joinIdx).contains("Exchange"), plan)
      assert(plan.contains("SelectedBucketsCount"), plan)
      // and the result matches the plain (shuffled) join
      val expect = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      val got = joined.collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(got == expect && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("BucketedLayout memoizes per session: second ensure() reuses the files") {
    import org.apache.hadoop.fs.Path
    val (ot, _) = core.BucketedLayout.ensure(spark, sf)
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $ot")
      .filter(col("col_name") === "Location").head.getString(1)
    val fs = new Path(loc).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def newest: Long = fs.listStatus(new Path(loc))
      .map(_.getModificationTime).max
    val t1 = newest
    core.BucketedLayout.ensure(spark, sf) // must be a catalog hit, no rewrite
    assert(newest == t1, "second ensure() rewrote the bucketed layout")
    // and the gated query returns the plain join's answer
    val got = core.BucketedLayout.customerQuantities(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val exp = core.Tables.lineitem(spark, sf)
      .join(core.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got == exp && got.nonEmpty)
  }

  test("PartitionedLayout prunes at the partition level and matches the flat scan") {
    val got = core.PartitionedLayout.clickRollup(spark, sf) // gate throws inside
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val exp = core.Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .groupBy(pmod(col("user_id"), lit(10)).as("user_bucket"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("total_value"))
      .orderBy("user_bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == exp && got.nonEmpty)
    // second call reuses the fingerprint-keyed layout (no rewrite)
    val path = core.PartitionedLayout.ensure(spark, sf)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def newest: Long = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getModificationTime).max
    val t1 = newest
    core.PartitionedLayout.ensure(spark, sf)
    assert(newest == t1, "second ensure() rewrote the partitioned layout")
  }
}
