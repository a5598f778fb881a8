package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{SaltedJoin, Tables}

class SaltedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("salted join returns exactly the rows of the plain join") {
    val li = Tables.lineitem(spark, SparkTestSession.sf)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val part = Tables.part(spark, SparkTestSession.sf)
      .withColumnRenamed("p_partkey", "l_partkey")
      .select("l_partkey", "p_name")

    val plain = li.join(part, "l_partkey")
      .groupBy("l_partkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = SaltedJoin.join(li, part, "l_partkey",
        saltSource = "l_orderkey", n = 8)
      .groupBy("l_partkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("forceShuffle pins the salt fan-out in the physical plan") {
    // the demo entry's shape: a Zipf-hot key joined to its stats —
    // without forceShuffle the tiny stats side would auto-broadcast and
    // the salt would be decorative; with it the plan must keep a
    // ShuffledHashJoin whose join key includes __salt (the hot key
    // spread over n reducers — the thing salting exists to show)
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, SparkTestSession.sf)
      .withColumn("skew_key",
        when(pmod(col("user_id"), lit(100)) < 80, 0L)
          .otherwise(pmod(col("user_id"), lit(100))))
    val stats = ev.groupBy("skew_key").agg(avg("value").as("avg_value"))
    val joined = SaltedJoin.join(ev, stats, "skew_key", "event_id",
      n = 8, forceShuffle = true)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.take(2000))
    assert(plan.contains("__salt"), plan.take(2000))
    // and results are still exactly the plain join's
    val a = joined.groupBy("skew_key").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = ev.join(stats, "skew_key").groupBy("skew_key").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b && a.nonEmpty)
  }
}
