package graft

import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{Graph, GraphOps}

/** Differential test of the iterative graph operators against in-memory
  * reference implementations over random graphs (cycles included).
  */
class GraphPropSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new Random(7)
  private val n = 25
  private val ids = (0 until n).map(i => s"v$i")
  private val edges: Seq[(String, String)] = (0 until 70).map { _ =>
    (ids(rnd.nextInt(n)), ids(rnd.nextInt(n)))
  }.distinct.filter { case (a, b) => a != b }

  private lazy val g = Graph(
    nodes = ids.map(i => (i, "V", i, 0.0, "s")).toDF("id", "label", "name", "num", "seg"),
    edges = edges.map { case (a, b) => (a, b, "E") }.toDF("src", "dst", "type"))

  private val adj: Map[String, Seq[String]] =
    edges.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

  /** Reference: all cycle-free out-paths ≤ depth. */
  private def refTraverse(start: String, depth: Int): Set[String] = {
    def go(path: List[String], d: Int): Seq[List[String]] =
      if (d == 0) Nil
      else adj.getOrElse(path.head, Nil).filterNot(path.contains).flatMap { nxt =>
        Seq(nxt :: path) ++ go(nxt :: path, d - 1)
      }
    go(List(start), depth).map(_.reverse.mkString("->")).toSet
  }

  /** Reference: minimal depth + lexicographically-least minimal path. */
  private def refBfs(start: String, maxDepth: Int): Map[String, (Int, String)] = {
    var best = Map.empty[String, (Int, String)]
    var frontier = Map(start -> start) // node -> min path
    var visited = Set(start)
    for (d <- 1 to maxDepth) {
      val nextPaths = frontier.toSeq.flatMap { case (node, path) =>
        adj.getOrElse(node, Nil).filterNot(visited).map(nxt => nxt -> s"$path->$nxt")
      }
      val next = nextPaths.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      next.foreach { case (node, path) => best += node -> (d, path) }
      visited ++= next.keySet
      frontier = next
    }
    best
  }

  test("traverse matches the reference path set at depths 1..3") {
    for (start <- Seq("v0", "v3", "v7"); depth <- 1 to 3) {
      val got = GraphOps.traverse(g, start, depth)
        .select("path").collect().map(_.getString(0)).toSet
      assert(got == refTraverse(start, depth), s"start=$start depth=$depth")
    }
  }

  test("bfsPaths matches the reference minimal-depth canonical paths") {
    for (start <- Seq("v0", "v5")) {
      val got = GraphOps.bfsPaths(g, start, 4)
        .collect().map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
      assert(got == refBfs(start, 4), s"start=$start")
    }
  }

  test("neighbors matches adjacency in all directions") {
    val node = "v2"
    val out = adj.getOrElse(node, Nil).toSet
    val in = edges.filter(_._2 == node).map(_._1).toSet
    def ids(dir: String) = GraphOps.neighbors(g, node, dir)
      .select("id").collect().map(_.getString(0)).toSet
    assert(ids("out") == out)
    assert(ids("in") == in)
    assert(ids("both") == (out ++ in))
  }
}
