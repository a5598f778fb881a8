package graft.knn

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import graft.functions.VectorFunctions._

/** Maximal-marginal-relevance diversified top-k (beyond the reference —
  * jcolano/fastpyvectordb returns raw nearest neighbors only; MMR is the
  * standard result-diversification pass a RAG/retrieval stack runs on
  * top: Carbonell & Goldstein, SIGIR'98).
  *
  * Greedy MMR: start from the most relevant candidate, then repeatedly
  * add the candidate maximizing `λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)`
  * over the already-selected set S. Exact greedy is inherently
  * sequential in k, so the engine splits the work by scale:
  *
  *  - candidate generation is DISTRIBUTED — exact top-`n` by cosine
  *    relevance via `TakeOrderedAndProject` (the same plan as
  *    [[Knn.search]], per-partition heaps + k-way merge), the part that
  *    scans the corpus and the only part that grows with data;
  *  - the n×n candidate similarity matrix is computed IN SPARK (one
  *    broadcast self-join of the n-row candidate set — n is a literal
  *    constant, so the crossJoin is bounded by construction) keeping
  *    every float kernel in the same Catalyst expressions the oracle's
  *    DuckDB twins mirror;
  *  - the greedy selection itself runs on the DRIVER over the collected
  *    n relevances + n·(n−1) sims (bounded collect: n=50 ⇒ ≤ 2,500
  *    rows) — at 100 TB this head stays n rows no matter the corpus.
  *
  * Determinism: relevance and sims stay FULL-PRECISION doubles end to
  * end (the cosine kernels accumulate left-to-right in both engines —
  * bit-identical by design), every argmax ties on ascending id, the
  * driver combines with the same IEEE-double `λ·rel − (1−λ)·ms`
  * expression the oracle's unrolled SQL evaluates, and the score is
  * rounded ONCE, for display. Rounding intermediates instead
  * double-rounds: a 1-ulp difference in a rounded input walks the final
  * round onto a display boundary (observed on row 10 of the first
  * sf0.01 run).
  */
object Mmr {
  /** λ = relevance weight; 0.5 balances relevance and diversity. */
  val Lambda = 0.5

  private case class Cand(id: Long, rel: Double)

  /** Diversified top-k of `data` for query vector `query`:
    * (rnk 1..k, id, mmr score rounded to 6). */
  def rerank(
      data: DataFrame,
      vectorCol: String,
      query: org.apache.spark.sql.Column,
      idCol: String = "vec_id",
      n: Int = 50,
      k: Int = 10): DataFrame = {
    require(k >= 1 && n >= k, s"need n >= k >= 1, got n=$n k=$k")
    val s = data.sparkSession
    // distributed head: exact top-n by relevance (ties on id) — the only
    // stage that scans the corpus
    val cand = data
      .select(col(idCol).as("id"), col(vectorCol).as("v"))
      .withColumn("rel", lit(1.0) - cosineDistance(col("v"), query))
      .orderBy(col("rel").desc, col("id"))
      .limit(n)
      .localCheckpoint() // n rows; feeds the self-join twice below
    // candidate sim matrix, kernels in Catalyst (oracle-twin math);
    // bounded crossJoin: both sides are the n-row checkpointed head.
    // Cosine is exactly symmetric (per-element products commute, norms
    // swap in a multiplication), so compute each unordered pair ONCE
    // (ia < ib) and mirror it into the map — halves the kernel work and
    // the collect vs the full n·(n−1) matrix.
    val sims = cand.select(col("id").as("ia"), col("v").as("va"))
      .crossJoin(broadcast(cand.select(col("id").as("ib"), col("v").as("vb"))))
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        (lit(1.0) - cosineDistance(col("va"), col("vb"))).as("s"))
    val cands = cand.select("id", "rel").collect()
      .map(r => Cand(r.getLong(0), r.getDouble(1))).toSeq
    val simMap: Map[(Long, Long), Double] = sims.collect()
      .flatMap { r =>
        val (a, b, v) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        Seq((a, b) -> v, (b, a) -> v)
      }.toMap
    // greedy head: k sequential argmaxes over ≤ n candidates
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
    while (selected.size < math.min(k, cands.size)) {
      val scored = remaining.map { c =>
        val ms =
          if (selected.isEmpty) 0.0
          else selected.map(sel => simMap((c.id, sel._1))).max
        (c, Lambda * c.rel - (1.0 - Lambda) * ms)
      }
      // max score, ties on ascending id — matches the oracle's
      // ORDER BY sc DESC, vec_id LIMIT 1
      val best = scored.minBy { case (c, sc) => (-sc, c.id) }
      selected += ((best._1.id, best._2))
      remaining -= best._1
    }
    val rows = selected.zipWithIndex.map { case ((id, sc), i) =>
      Row((i + 1).toLong, id, sc)
    }
    val schema = StructType(Seq(
      StructField("rnk", LongType, nullable = false),
      StructField(idCol, LongType, nullable = false),
      StructField("mmr", DoubleType, nullable = false)))
    s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1), schema)
      .withColumn("mmr", round(col("mmr"), 6))
  }

  /** DuckDB oracle twin: the greedy loop UNROLLED into k chained CTEs
    * (step i selects its argmax with `ORDER BY sc DESC, vec_id LIMIT 1`
    * against the union of the previous steps). λ is spelled
    * `CAST(.. AS DOUBLE)` — bare decimal literals parse as DECIMAL and
    * decimal arithmetic rounds quotients/products before the comparison
    * (the text_drift_kl sf0.1 incident, SURVEY §6.5). Every CTE is
    * `AS MATERIALIZED`: DuckDB inlines plain CTEs at each reference, and
    * since step i references ALL previous steps the inlined tree is
    * exponential in k — enough re-opened parquet scans to exhaust the
    * process fd limit before it exhausts patience. */
  def rerankSql(table: String, vectorCol: String, idCol: String,
      queryKey: Long, dim: Int, n: Int = 50, k: Int = 10): String = {
    val lam = "CAST(0.5 AS DOUBLE)"
    val relExpr =
      s"(1.0 - ${cosineDistanceSql(vectorCol, "q.v", dim)})"
    val simExpr = s"(1.0 - ${cosineDistanceSql(
        s"a.$vectorCol", s"b.$vectorCol", dim)})"
    val steps = (2 to k).map { i =>
      val sel = (1 until i).map(j => s"SELECT $idCol FROM s$j")
        .mkString(" UNION ALL ")
      s"""s$i AS MATERIALIZED (
         |  SELECT c.$idCol,
         |         $lam * c.rel - (1.0 - $lam) * (
         |           SELECT max(s) FROM sims
         |           WHERE ia = c.$idCol AND ib IN ($sel)) AS sc
         |  FROM cand c
         |  WHERE c.$idCol NOT IN ($sel)
         |  ORDER BY sc DESC, c.$idCol LIMIT 1)""".stripMargin
    }
    val out = (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rnk, $idCol, round(sc, 6) AS mmr FROM s$i")
      .mkString("\nUNION ALL\n")
    val s1 =
      s"""s1 AS MATERIALIZED (
         |  SELECT $idCol, $lam * rel AS sc
         |  FROM cand ORDER BY rel DESC, $idCol LIMIT 1)""".stripMargin
    // join ALL step CTEs with one mkString — k=1 has no s2.. steps and
    // must not leave a dangling comma before the final SELECT
    val allSteps = (s1 +: steps).mkString(",\n")
    s"""WITH q AS (SELECT ${hashVectorSql(queryKey.toString, dim)} AS v),
       |cand AS MATERIALIZED (
       |  SELECT $idCol, $relExpr AS rel, $vectorCol
       |  FROM $table, q
       |  ORDER BY rel DESC, $idCol LIMIT $n),
       |sims AS MATERIALIZED (
       |  SELECT a.$idCol AS ia, b.$idCol AS ib, $simExpr AS s
       |  FROM cand a JOIN cand b ON a.$idCol <> b.$idCol),
       |$allSteps
       |$out
       |ORDER BY rnk""".stripMargin
  }
}
