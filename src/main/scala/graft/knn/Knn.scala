package graft.knn

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Exact k-nearest-neighbor search, Spark-first.
  *
  * The reference's brute-force path (`vectordb_optimized.py:650-721`)
  * computes all distances then argpartition-top-k; Spark's
  * `orderBy(score).limit(k)` plans a `TakeOrderedAndProject` — per-partition
  * O(n) heaps with a final k-way merge — which is the same algorithm,
  * already distributed. Filters are applied BEFORE scoring (exact filtered
  * top-k; strictly better than the reference's over-fetch + post-filter,
  * which can under-fill k — see SURVEY.md §4).
  *
  * Scores are rounded to 6 decimals so the DuckDB oracle (double math, same
  * accumulation order) hash-matches; ties break on the id column.
  */
object Knn {

  def distance(metric: String, a: Column, b: Column): Column = metric match {
    case "cosine" => cosineDistance(a, b)
    case "l2"     => l2Distance(a, b)
    case "ip"     => ipDistance(a, b)
    case m        => throw new IllegalArgumentException(s"unknown metric $m")
  }

  def distanceSql(metric: String, a: String, b: String, dim: Int): String =
    metric match {
      case "cosine" => cosineDistanceSql(a, b, dim)
      case "l2"     => l2DistanceSql(a, b, dim)
      case "ip"     => ipDistanceSql(a, b, dim)
      case m        => throw new IllegalArgumentException(s"unknown metric $m")
    }

  /** Exact top-k: score → (optional) filter → TakeOrderedAndProject. */
  def search(
      data: DataFrame,
      vectorCol: Column,
      query: Column,
      metric: String = "cosine",
      k: Int = 10,
      filter: Option[Column] = None,
      idCol: String = "vec_id"): DataFrame = {
    val filtered = filter.map(data.filter).getOrElse(data)
    filtered
      .withColumn("score", round(distance(metric, vectorCol, query), 6))
      .orderBy(col("score"), col(idCol))
      .limit(k)
  }

  /** Batch search: broadcast the (small) query set, score every (query,
    * data) pair, keep top-k per query via a ranking window — the Spark
    * form of the reference's batch GEMM search (`parallel_search.py:246-311`).
    */
  def searchBatch(
      data: DataFrame,
      vectorCol: Column,
      queries: DataFrame, // (query_id, qvec)
      metric: String = "cosine",
      k: Int = 10,
      idCol: String = "vec_id"): DataFrame = {
    val scored = data
      .crossJoin(broadcast(queries))
      .withColumn("score", round(distance(metric, vectorCol, col("qvec")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score"), col(idCol))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn", "qvec")
  }
}
