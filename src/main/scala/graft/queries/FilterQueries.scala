package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.filter._

/** Filter-DSL queries (SURVEY.md §2.3) — each exercises several predicate
  * ops composed with and/or/not, then aggregates so results stay small at
  * any scale factor. The predicate compiles to one Catalyst Column, so at
  * 100 TB the conjuncts reach the Parquet scan as PushedFilters instead of
  * the reference's per-row Python post-filter.
  */
object FilterQueries {
  val qs: Seq[Q] = Seq(
    Q(
      "filter_composite",
      (s, dir) => {
        val pred = Or(
          And(Eq("l_returnflag", "R"), Gt("l_quantity", 30)),
          And(Not(Eq("l_linestatus", "F")), Lte("l_discount", 0.02)))
        Tables.lineitem(s, dir)
          .filter(pred.column)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"),
               sum("l_quantity").as("sum_qty"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          |       sum(l_quantity) AS sum_qty
          |FROM lineitem
          |WHERE (l_returnflag = 'R' AND l_quantity > 30)
          |   OR (NOT l_linestatus = 'F' AND l_discount <= 0.02)
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      bench = true
    ),
    Q(
      "filter_text_ops",
      (s, dir) => {
        val pred = Or(
          And(In("p_type", Seq("ECONOMY", "PROMO")),
              Contains("p_name", "widget")),
          Regex("p_name", "^blue"))
        Tables.part(s, dir)
          .filter(pred.column)
          .groupBy("p_type")
          .agg(count(lit(1)).as("n"), min("p_name").as("first_name"))
          .orderBy("p_type")
      },
      Some(
        """SELECT p_type, count(*) AS n, min(p_name) AS first_name
          |FROM part
          |WHERE (p_type IN ('ECONOMY', 'PROMO') AND p_name LIKE '%widget%')
          |   OR regexp_matches(p_name, '^blue')
          |GROUP BY p_type
          |ORDER BY p_type""".stripMargin)
    ),
    Q(
      "filter_ne_nin",
      (s, dir) => {
        val pred = And(
          Nin("o_orderpriority", Seq("1-URGENT", "2-HIGH")),
          Ne("o_orderstatus", "F"),
          Gte("o_totalprice", 1000.0))
        Tables.orders(s, dir)
          .filter(pred.column)
          .groupBy("o_orderpriority", "o_orderstatus")
          .agg(count(lit(1)).as("n"),
               round(avg("o_totalprice"), 2).as("avg_price"))
          .orderBy("o_orderpriority", "o_orderstatus")
      },
      // Testdata columns are non-null, so the reference's present-AND-
      // different `ne`/`nin` semantics coincide with plain SQL <> / NOT IN
      // (the NULL divergence is covered by FilterSpec unit tests).
      Some(
        """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
          |       round(avg(o_totalprice), 2) AS avg_price
          |FROM orders
          |WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
          |  AND o_orderstatus <> 'F'
          |  AND o_totalprice >= 1000.0
          |GROUP BY o_orderpriority, o_orderstatus
          |ORDER BY o_orderpriority, o_orderstatus""".stripMargin)
    )
  )
}
