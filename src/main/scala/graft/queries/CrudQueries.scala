package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables

/** DML semantics as pure transformations (the stateful Collection API is
  * exercised in CollectionSpec; these catalog entries pin the relational
  * algebra of upsert/delete/get/peek against SQL oracles).
  */
object CrudQueries {
  val qs: Seq[Q] = Seq(
    // upsert = anti-join out the updated keys, union the new versions
    Q(
      "crud_upsert",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        val updates = orders.filter(col("o_orderkey") <= 100)
          .withColumn("o_orderstatus", lit("U"))
        orders.join(updates.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
          .unionByName(updates)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
               round(sum("o_totalprice"), 2).as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some(
        """WITH updates AS (
          |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice,
          |         o_orderdate, o_orderpriority
          |  FROM orders WHERE o_orderkey <= 100),
          |merged AS (
          |  SELECT * FROM orders
          |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
          |  UNION ALL SELECT * FROM updates)
          |SELECT o_orderstatus, count(*) AS n,
          |       round(sum(o_totalprice), 2) AS sum_price
          |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin),
      bench = true
    ),
    // delete-by-filter = retain the complement
    Q(
      "crud_delete_where",
      (s, dir) =>
        Tables.orders(s, dir)
          .filter(!(col("o_orderpriority") === "1-URGENT"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .orderBy("o_orderpriority"),
      Some(
        """SELECT o_orderpriority, count(*) AS n
          |FROM orders WHERE NOT (o_orderpriority = '1-URGENT')
          |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    // point-lookup batch (get_batch) — pushed-down id IN scan
    Q(
      "crud_get_batch",
      (s, dir) =>
        Tables.customer(s, dir)
          .filter(col("c_custkey").isin(1L, 5L, 10L, 99L))
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey"),
      Some(
        """SELECT c_custkey, c_name, c_mktsegment FROM customer
          |WHERE c_custkey IN (1, 5, 10, 99) ORDER BY c_custkey""".stripMargin)
    ),
    // get-by-filter (reference client `collection.get(where=...)`,
    // tests/test_client.py:172-182) — full matching rows back, predicate
    // from the filter DSL so the leaves reach the scan as PushedFilters.
    // The key bound keeps the result ≤ ~200 rows at ANY scale factor.
    Q(
      "crud_get_where",
      (s, dir) => {
        import graft.filter._
        val pred = And(Eq("c_mktsegment", "BUILDING"),
                       Lt("c_custkey", 200L))
        Tables.customer(s, dir).filter(pred.column)
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some(
        """SELECT c_custkey, c_name, c_mktsegment FROM customer
          |WHERE c_mktsegment = 'BUILDING' AND c_custkey < 200
          |ORDER BY c_custkey""".stripMargin)
    ),
    // peek = deterministic first-n sample
    Q(
      "crud_peek",
      (s, dir) =>
        Tables.part(s, dir).orderBy("p_partkey").limit(5)
          .select("p_partkey", "p_name", "p_type"),
      Some(
        """SELECT p_partkey, p_name, p_type FROM part
          |ORDER BY p_partkey LIMIT 5""".stripMargin)
    )
  )
}
