package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hyperedge (n-ary membership) operators — the reference's hyperedge
  * CRUD + node lookup with any/all modes (jcolano/fastpyvectordb
  * `graph.py:125-148, 429-488, 766-812`). Representation: an exploded
  * membership relation `(he_id, node)` plus an optional `(he_id, type)`
  * attribute table; "O(1) index lookups" become semi-joins, `all`-mode
  * matching is the classic count-equals-|query| group check.
  */
object Hyperedges {

  /** Membership relation from typed edges (e.g. HAS_PART: an order spans
    * its parts). */
  def fromEdges(g: Graph, edgeType: String): DataFrame =
    g.edges.filter(col("type") === edgeType)
      .select(col("src").as("he_id"), col("dst").as("node"))

  /** Hyperedges containing a node. */
  def byNode(membership: DataFrame, node: String): DataFrame =
    membership.filter(col("node") === node).select("he_id").distinct()

  /** Hyperedges matching a node set: mode "any" = at least one of the
    * nodes (semi-join); mode "all" = every queried node present
    * (matched-count == |query set|, reference `graph.py:457-478`).
    * Returns (he_id, n_matched).
    */
  def byNodes(membership: DataFrame, nodes: Seq[String], mode: String): DataFrame = {
    val spark = membership.sparkSession
    import spark.implicits._
    val q = broadcast(nodes.distinct.toDF("node"))
    val matched = membership.join(q, "node")
      .groupBy("he_id")
      .agg(countDistinct("node").as("n_matched"))
    mode match {
      case "any" => matched
      case "all" => matched.filter(col("n_matched") === nodes.distinct.size)
      case m     => throw new IllegalArgumentException(s"mode $m")
    }
  }

  /** Create a hyperedge; every member node must exist (reference
    * membership validation, `graph.py:770-776`). */
  def create(g: Graph, membership: DataFrame, heId: String,
      nodes: Seq[String]): DataFrame = {
    val spark = membership.sparkSession
    import spark.implicits._
    require(membership.filter(col("he_id") === heId).isEmpty,
      s"hyperedge '$heId' already exists") // reference graph.py:769-770
    val members = nodes.distinct.toDF("node")
    val missing = members
      .join(g.nodes.select(col("id").as("node")), Seq("node"), "left_anti")
      .count()
    require(missing == 0, s"$missing member node(s) do not exist")
    membership.unionByName(
      members.select(lit(heId).as("he_id"), col("node")))
  }

  def delete(membership: DataFrame, heId: String): DataFrame =
    membership.filter(col("he_id") =!= heId)
}
