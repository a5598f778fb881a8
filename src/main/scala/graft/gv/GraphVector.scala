package graft.gv

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.graph.Graph

/** Graph + vector hybrid retrieval — the reference's
  * `HybridGraphVectorDB` (jcolano/fastpyvectordb
  * `hybrid_graph_vector.py:337-511`), two operators:
  *
  * **semanticGraphSearch** (`:337-453`): top-(2k) vector seeds over the
  * embedded nodes (similarity = 1 − cosine distance, `:316`), then BFS
  * expansion `hop = 1..H` over both edge directions; every node first
  * reached at hop h scores
  *   `vw · max(seed scores) · 1/(1+hop) + gw · (1/hop)`   (`:408-416`)
  * — faithfully including the reference's global-max-seed quirk (`:410`:
  * the *best* seed score decays, not the nearest seed's), so all nodes at
  * a hop share one score. Seeds keep their raw similarity. Ties are
  * broken by node id (the reference inherits Python dict order — we
  * document the deterministic divergence).
  *
  * **graphRerank** (`:459-511`): bounded traversal from a start node,
  * de-duplicate end nodes (canonical least path — reference keeps DFS
  * first-encounter order), score ends by raw cosine *similarity* when the
  * node has an embedding else 0, sort desc.
  *
  * Scale: seeds are one TakeOrderedAndProject; each hop is one join of a
  * frontier (≤ reachable set) against the edges table, anti-joined with
  * the visited set — the standard iterative-BFS-on-DataFrames shape with
  * bounded depth.
  */
object GraphVector {

  /** Per-hop combined-score formula, identical text in both engines. */
  def hopScore(vw: Double, gw: Double, hop: Int): String =
    s"($vw * max_sim * (1.0 / (1.0 + $hop.0)) + $gw * (1.0 / $hop.0))"

  def semanticGraphSearch(
      g: Graph,
      embNodes: DataFrame, // (id, embedding)
      queryVec: Seq[Double],
      k: Int,
      expandHops: Int,
      vw: Double,
      gw: Double,
      edgeType: Option[String] = None): DataFrame = {
    val qv = typedlit(queryVec)
    val seeds = embNodes
      .withColumn("sim", lit(1.0) - VectorFunctions.cosineDistance(col("embedding"), qv))
      .select("id", "sim")
      .orderBy(desc("sim"), col("id"))
      .limit(k * 2)
      .localCheckpoint() // seeds are reused 2·hops times — cut lineage
    val maxSeed = seeds.agg(max("sim").as("max_sim"))

    val e0 = edgeType.map(t => g.edges.filter(col("type") === t)).getOrElse(g.edges)
    val und = e0.select(col("src").as("a"), col("dst").as("b"))
      .union(e0.select(col("dst").as("a"), col("src").as("b")))

    var visited = seeds.select(col("id").as("vid"))
    var frontier = seeds.select(col("id"))
    var acc = seeds.select(col("id"), round(col("sim"), 6).as("score"),
      lit(0).as("hop"))
    // Every frontier is localCheckpoint'ed, so its exact row count is a
    // cheap driver-side fact — hint the broadcast only when the MEASURED
    // size is safely bounded (never a forced broadcast of an unbounded
    // set: a huge hop-2 frontier at scale simply skips the hint and the
    // edges side shuffles, which is then the right plan anyway).
    var frontierRows = 2L * k
    var visitedRows = 2L * k
    for (hop <- 1 to expandHops) {
      val f = if (frontierRows <= graft.graph.GraphOps.FrontierHintRows)
        broadcast(frontier) else frontier
      val v = if (visitedRows <= graft.graph.GraphOps.FrontierHintRows)
        broadcast(visited) else visited
      val last = hop == expandHops
      val next0 = f
        .join(und, col("id") === col("a"))
        .select(col("b").as("id")).distinct()
        .join(v, col("id") === col("vid"), "left_anti")
      // The LAST hop's frontier has exactly one consumer (acc) — no
      // next hop reads it and the visited union is dead — so its
      // checkpoint + gate count were two pure-overhead jobs per rep
      // (r17); earlier hops keep the materialize-and-measure contract
      // (reused by acc + visited + the next hop over the 2×-edges
      // union, and the count drives the broadcast gate).
      val next = if (last) next0 else next0.localCheckpoint()
      if (!last) {
        val n = next.count() // materialized: counting is metadata-cheap
        frontierRows = n
        visitedRows += n
      }
      acc = acc.union(
        next.crossJoin(broadcast(maxSeed))
          .selectExpr("id", s"round(${hopScore(vw, gw, hop)}, 6) as score",
            s"$hop as hop"))
      if (!last) {
        visited = visited.union(next.select(col("id").as("vid")))
        frontier = next
      }
    }
    acc.orderBy(desc("score"), col("id")).limit(k)
  }

  /** DuckDB oracle: embedded nodes = customers with hash-vector
    * embeddings keyed by custkey; full graph from TpchGraph CTEs.
    */
  def semanticGraphSearchSql(
      graphCtes: String,
      queryKey: Long,
      dim: Int,
      k: Int,
      vw: Double,
      gw: Double,
      edgeType: Option[String] = None): String = {
    val emb = VectorFunctions.hashVectorSql("c_custkey", dim)
    val dist = VectorFunctions.cosineDistanceSql("emb", "q.v", dim)
    val typeFilter = edgeType.map(t => s" WHERE type = '$t'").getOrElse("")
    s"""WITH $graphCtes,
       |q AS (SELECT ${VectorFunctions.hashVectorSql(queryKey.toString, dim)} AS v),
       |en AS (SELECT 'c:' || c_custkey AS id, $emb AS emb FROM customer),
       |seeds AS (
       |  SELECT en.id, 1.0 - $dist AS sim FROM en, q
       |  ORDER BY sim DESC, id LIMIT ${2 * k}),
       |ms AS (SELECT max(sim) AS max_sim FROM seeds),
       |und AS (SELECT src AS a, dst AS b FROM edges$typeFilter
       |        UNION ALL SELECT dst, src FROM edges$typeFilter),
       |h1 AS (
       |  SELECT DISTINCT und.b AS id FROM seeds JOIN und ON und.a = seeds.id
       |  WHERE und.b NOT IN (SELECT id FROM seeds)),
       |h2 AS (
       |  SELECT DISTINCT und.b AS id FROM h1 JOIN und ON und.a = h1.id
       |  WHERE und.b NOT IN (SELECT id FROM seeds)
       |    AND und.b NOT IN (SELECT id FROM h1)),
       |res AS (
       |  SELECT id, round(sim, 6) AS score, 0 AS hop FROM seeds
       |  UNION ALL
       |  SELECT id, round(${hopScore(vw, gw, 1)}, 6), 1 FROM h1, ms
       |  UNION ALL
       |  SELECT id, round(${hopScore(vw, gw, 2)}, 6), 2 FROM h2, ms)
       |SELECT id, score, hop FROM res
       |ORDER BY score DESC, id LIMIT $k""".stripMargin
  }

  def graphRerank(
      traversePaths: DataFrame, // (depth, path, end_id) from GraphOps.traverse
      endEmbeddings: DataFrame, // (id, embedding) — nodes that have vectors
      queryVec: Seq[Double],
      k: Int): DataFrame = {
    val qv = typedlit(queryVec)
    // materialize the traversal once: the canonical-path groupBy and the
    // depth-recovery join both consume it, and its lineage is maxDepth
    // chained joins — re-executing that per consumer tripled the wall
    // (2.8 s warm at sf0.1; the path set is one start node's bounded
    // ≤ maxDepth-hop neighborhood, safe to pin at any corpus size)
    val tp = traversePaths.localCheckpoint()
    val canonical = tp
      .groupBy("end_id").agg(min("path").as("path"))
    val withDepth = canonical
      .join(tp, Seq("end_id", "path")) // recover the path's depth
      .select("end_id", "path", "depth")
    withDepth
      .join(endEmbeddings, col("end_id") === col("id"), "left_outer")
      .withColumn("score",
        round(coalesce(
          VectorFunctions.vecDot(col("embedding"), qv) /
            (sqrt(VectorFunctions.vecDot(col("embedding"), col("embedding"))) *
              sqrt(VectorFunctions.vecDot(qv, qv))),
          lit(0.0)), 6))
      .select("end_id", "score", "depth", "path")
      .orderBy(desc("score"), col("end_id"))
      .limit(k)
  }
}
