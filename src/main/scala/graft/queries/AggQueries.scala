package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables

/** Relational aggregate queries (SURVEY.md §2.12) — the reference's
  * aggregation surface is corpus/stat computation; here expressed as
  * declarative groupBy/agg so Catalyst plans partial (map-side) aggregation.
  * Double sums of non-integer values are rounded to absorb order-of-
  * accumulation ulps between Spark's parallel agg and DuckDB's.
  */
object AggQueries {
  val qs: Seq[Q] = Seq(
    Q(
      "q1_agg",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum("l_quantity").as("sum_qty"), // integer-valued: exact in double
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            round(avg("l_discount"), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(
        """SELECT l_returnflag, l_linestatus,
          |       sum(l_quantity) AS sum_qty,
          |       round(sum(l_extendedprice), 2) AS sum_base_price,
          |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
          |       round(avg(l_quantity), 4) AS avg_qty,
          |       round(avg(l_discount), 6) AS avg_disc,
          |       count(*) AS count_order
          |FROM lineitem
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      bench = true
    ),
    // multi-table join pipeline: revenue by nation (broadcast the small
    // dimension chain, shuffle-join the fact tables on their keys)
    Q(
      "q3_join",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
                 .as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy("n_name")
      },
      Some(
        """SELECT n_name,
          |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin),
      bench = true
    )
  )
}
