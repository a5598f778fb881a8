package graft.graph

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Graph DML as relation rewrites — the reference's node/edge CRUD with
  * five-index maintenance (jcolano/fastpyvectordb `graph.py:588-760`)
  * collapses to unions/filters/joins here; there are no indexes to
  * maintain, and the cascade invariant (deleting a node removes every
  * incident edge, `graph.py:637-651`) is one anti-join.
  *
  * All operators return a new Graph; persistence is the caller's parquet
  * write (same generation-swap pattern as core.VectorCollection).
  */
object GraphMutations {

  def createNode(g: Graph, id: String, label: String, name: String,
      num: Option[Double] = None, seg: Option[String] = None): Graph = {
    val row = g.nodes.sparkSession.createDataFrame(
      java.util.Arrays.asList(
        Row(id, label, name, num.map(Double.box).orNull, seg.orNull)),
      g.nodes.schema)
    Graph(g.nodes.unionByName(row), g.edges)
  }

  /** Merge-style property update (reference update_node merges dicts). */
  def updateNode(g: Graph, id: String,
      num: Option[Double] = None, seg: Option[String] = None): Graph = {
    val updated = g.nodes.withColumns(Map(
      "num" -> when(col("id") === id, num.map(lit).getOrElse(col("num")))
        .otherwise(col("num")),
      "seg" -> when(col("id") === id, seg.map(lit).getOrElse(col("seg")))
        .otherwise(col("seg"))))
    Graph(updated, g.edges)
  }

  /** Delete a node; cascade removes every incident edge. */
  def deleteNode(g: Graph, id: String, cascade: Boolean = true): Graph = {
    val nodes = g.nodes.filter(col("id") =!= id)
    val edges =
      if (cascade) g.edges.filter(col("src") =!= id && col("dst") =!= id)
      else g.edges
    Graph(nodes, edges)
  }

  /** Create an edge; both endpoints must exist (reference FK check,
    * graph.py:712-719) — verified with an anti-join count. */
  def createEdge(g: Graph, src: String, dst: String, tpe: String): Graph = {
    val endpoints = g.nodes.sparkSession.createDataset(Seq(src, dst))(
      org.apache.spark.sql.Encoders.STRING).toDF("id")
    val missing = endpoints
      .join(g.nodes.select("id"), Seq("id"), "left_anti").count()
    require(missing == 0, s"$missing endpoint(s) missing for $src->$dst")
    val row = g.edges.sparkSession.createDataFrame(
      java.util.Arrays.asList(Row(src, dst, tpe)), g.edges.schema)
    Graph(g.nodes, g.edges.unionByName(row))
  }

  def deleteEdge(g: Graph, src: String, dst: String, tpe: String): Graph =
    Graph(g.nodes, g.edges.filter(
      !(col("src") === src && col("dst") === dst && col("type") === tpe)))
}
