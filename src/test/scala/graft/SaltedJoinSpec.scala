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
}
