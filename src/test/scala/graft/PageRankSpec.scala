package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{Graph, GraphOps}

/** Fixed-point PageRank: hand-computed ranks on a star graph, and the
  * integer-arithmetic invariants (determinism across partition layouts,
  * sinks keep the base rank). */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def graph(edges: (String, String)*): Graph = {
    import spark.implicits._
    val ns = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => (id, "N", id, 0.0, "")).toDF("id", "label", "name", "num", "seg")
    Graph(ns, edges.map { case (s, d) => (s, d, "E") }.toDF("src", "dst", "type"))
  }

  test("star graph ranks match the hand formula") {
    // a→b, c→b: contrib(b) = 1e6 + 1e6; r1(b) = 150000 + (2e6·17) div 20
    val g = graph("a" -> "b", "c" -> "b")
    val r1 = GraphOps.pagerank(g, 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1("b") == 150000L + 2000000L * 17 / 20)
    assert(r1("a") == 150000L && r1("c") == 150000L)
    // iteration 2: a,c now hold 150000 → contrib(b) = 2·150000;
    // b's own mass flows nowhere (sink, no redistribution)
    val r2 = GraphOps.pagerank(g, 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r2("b") == 150000L + 300000L * 17 / 20)
  }

  test("personalized PageRank pins mass to the seed's reachable set") {
    // a→b, a→c, c→d; seed a. r1: a=teleport 150000; b,c each get
    // (1e6 div 2)·17 div 20 = 425000; d = 0. r2: d gets
    // (425000 div 1)·17 div 20 = 361250; b,c get (150000 div 2)·17 div 20
    // = 63750; unreachable-from-a nodes stay 0 forever.
    val g = graph("a" -> "b", "a" -> "c", "c" -> "d", "x" -> "y")
    val r = GraphOps.personalizedPagerank(g, "a", 2).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("a") == 150000L)
    assert(r("b") == 63750L && r("c") == 63750L)
    assert(r("d") == 361250L)
    assert(r("x") == 0L && r("y") == 0L)
  }

  test("random graphs match a driver-side reference") {
    val rnd = new scala.util.Random(5)
    for (trial <- 1 to 3) {
      val nodes = (0 until 20).map(i => s"n$i")
      val edges = (0 until 60).map { _ =>
        (nodes(rnd.nextInt(20)), nodes(rnd.nextInt(20)))
      }.distinct
      val iters = 3
      // reference: same integer fixed-point recurrence, computed naively
      val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
      var r = nodes.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val contrib = scala.collection.mutable.Map.empty[String, Long]
        for ((s, d) <- edges)
          contrib(d) = contrib.getOrElse(d, 0L) + r(s) / outdeg(s)
        r = nodes.map(n =>
          n -> (150000L + contrib.getOrElse(n, 0L) * 17 / 20)).toMap
      }
      val got = GraphOps.pagerank(graph(edges: _*), iters).collect()
        .map(x => x.getString(0) -> x.getLong(1)).toMap
      // the DF graph only carries nodes that appear in an edge
      val present = edges.flatMap(e => Seq(e._1, e._2)).distinct.toSet
      assert(got == r.filter(kv => present(kv._1)), s"trial=$trial")
    }
  }

  test("cycle conserves symmetric ranks; result is repartition-invariant") {
    val g = graph("a" -> "b", "b" -> "c", "c" -> "a")
    val r = GraphOps.pagerank(g, 5).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    // symmetric 1-regular cycle: every node keeps exactly 1e6 micro-units
    // under r' = 0.15e6 + 0.85·r (in exact integer arithmetic the
    // fixed point of x -> 150000 + x·17 div 20 from 1e6 stays 1e6)
    assert(r.values.toSet == Set(1000000L))
    val g2 = Graph(g.nodes.repartition(7), g.edges.repartition(5))
    val r2 = GraphOps.pagerank(g2, 5).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r2 == r)
  }
}
