package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.graph.{GraphOps, TpchGraph}
import graft.gv.GraphVector

/** Graph+vector catalog queries: semantic seed-and-expand search and
  * traversal-then-rerank. Embedded nodes are customers with deterministic
  * hash-vector embeddings keyed by custkey, so the DuckDB oracle rebuilds
  * the identical vectors.
  */
object GraphVectorQueries {
  private val D = Tables.EmbeddingDim
  private val K = 10
  private val C = TpchGraph.ctesSql

  // the materialized node-embedding table (built once per dir — see
  // Indexes.custEmb); values identical to deriving hashVector per query,
  // so the oracles are unchanged
  private def custEmb(s: org.apache.spark.sql.SparkSession, dir: String) =
    s.read.parquet(s"${graft.index.Indexes.custEmb(s, dir)}/vectors")

  val qs: Seq[Q] = Seq(
    Q(
      "semantic_graph_search",
      (s, dir) =>
        GraphVector.semanticGraphSearch(
          TpchGraph.build(s, dir), custEmb(s, dir),
          hashVectorValues(9L, D), K, expandHops = 2, vw = 0.7, gw = 0.3),
      Some(GraphVector.semanticGraphSearchSql(C, 9L, D, K, vw = 0.7, gw = 0.3)),
      bench = true
    ),
    // graph+vector store persistence, oracled (promoting the §2.8
    // save/load row from spec-only — the reference persists the hybrid
    // DB's graph and vector sides together and reloads them,
    // hybrid_graph_vector.py save/load): nodes, edges, and the node
    // embeddings are saved to a scratch store path, reloaded through
    // FRESH reads (no lineage to the originals), and the SAME semantic
    // search is served from the reloaded artifacts. The round-trip is
    // lossless, so the oracle is the live search's SQL unchanged — any
    // save/load corruption (schema drift, float truncation, lost rows)
    // breaks the hash.
    Q(
      "gv_persistence",
      (s, dir) => {
        val tmp = graft.core.Scratch.dir("graft_gv_store")
        try {
          val g = TpchGraph.build(s, dir)
          g.nodes.write.parquet(s"$tmp/nodes")
          g.edges.write.parquet(s"$tmp/edges")
          custEmb(s, dir).write.parquet(s"$tmp/emb")
          val g2 = graft.graph.Graph(
            s.read.parquet(s"$tmp/nodes"), s.read.parquet(s"$tmp/edges"))
          GraphVector.semanticGraphSearch(
              g2, s.read.parquet(s"$tmp/emb"),
              hashVectorValues(9L, D), K, expandHops = 2, vw = 0.7, gw = 0.3)
            .localCheckpoint() // pin the k rows so the store can be deleted
        } finally {
          val p = new org.apache.hadoop.fs.Path(tmp)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        }
      },
      Some(GraphVector.semanticGraphSearchSql(C, 9L, D, K, vw = 0.7, gw = 0.3))
    ),
    // edge-type-scoped expansion (the reference's edge_types argument,
    // hybrid_graph_vector.py semantic_graph_search): hops traverse ONLY
    // the named relation — here PLACED_BY, so expansion stays inside the
    // customer↔order neighborhood
    Q(
      "semantic_graph_search_typed",
      (s, dir) =>
        GraphVector.semanticGraphSearch(
          TpchGraph.build(s, dir), custEmb(s, dir),
          hashVectorValues(9L, D), K, expandHops = 2, vw = 0.7, gw = 0.3,
          edgeType = Some("PLACED_BY")),
      Some(GraphVector.semanticGraphSearchSql(C, 9L, D, K, vw = 0.7,
        gw = 0.3, edgeType = Some("PLACED_BY")))
    ),
    Q(
      "graph_rerank",
      (s, dir) => {
        val g = TpchGraph.build(s, dir)
        GraphVector.graphRerank(
          GraphOps.traverse(g, "o:1", 3), custEmb(s, dir),
          hashVectorValues(9L, D), K)
      },
      Some {
        val emb = hashVectorSql("c_custkey", D)
        val sim = s"${dotSql("en.emb", "q.v", D)} / " +
          s"(${normSql("en.emb", D)} * ${normSql("q.v", D)})"
        s"""WITH $C,
           |q AS (SELECT ${hashVectorSql("9", D)} AS v),
           |en AS (SELECT 'c:' || c_custkey AS id, $emb AS emb FROM customer),
           |d1 AS (SELECT 1 AS depth, 'o:1->' || dst AS path, dst AS h1,
           |              dst AS end_id
           |       FROM edges WHERE src = 'o:1'),
           |d2 AS (SELECT 2 AS depth, d1.path || '->' || e.dst AS path,
           |              d1.h1 AS h1, e.dst AS h2, e.dst AS end_id
           |       FROM d1 JOIN edges e ON e.src = d1.end_id
           |       WHERE e.dst <> 'o:1' AND e.dst <> d1.h1),
           |d3 AS (SELECT 3 AS depth, d2.path || '->' || e.dst AS path,
           |              e.dst AS end_id
           |       FROM d2 JOIN edges e ON e.src = d2.end_id
           |       WHERE e.dst <> 'o:1' AND e.dst <> d2.h1 AND e.dst <> d2.h2),
           |tr AS (SELECT depth, path, end_id FROM d1
           |       UNION ALL SELECT depth, path, end_id FROM d2
           |       UNION ALL SELECT depth, path, end_id FROM d3),
           |canon AS (SELECT end_id, min(path) AS path FROM tr GROUP BY end_id),
           |wd AS (SELECT c.end_id, c.path, t.depth
           |       FROM canon c JOIN tr t ON t.end_id = c.end_id
           |                              AND t.path = c.path)
           |SELECT wd.end_id, round(coalesce($sim, 0.0), 6) AS score,
           |       wd.depth, wd.path
           |FROM wd LEFT JOIN en ON en.id = wd.end_id, q
           |ORDER BY score DESC, end_id LIMIT $K""".stripMargin
      }
    )
  )
}
