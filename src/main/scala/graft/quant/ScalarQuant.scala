package graft.quant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Scalar quantization (f32 → 8-bit codes): per-dimension min/max train,
  * affine encode, decode-and-score search — the reference's
  * `ScalarQuantizer` (jcolano/fastpyvectordb `quantization.py:85-181`)
  * as pure DataFrame algebra.
  *
  * Train is one posexplode + groupBy(pos) aggregation (map-side combined,
  * one shuffle of D×partitions rows); the per-dim stats collapse to a
  * single broadcast row of arrays, so encode/search never shuffle the
  * data side. All arithmetic has an exact DuckDB twin.
  */
object ScalarQuant {
  val Levels = 255.0

  /** Per-dim stats (pos 1-based, mn, mx) — the train step. */
  def trainStats(emb: DataFrame, vecCol: String): DataFrame =
    emb
      .selectExpr(s"posexplode($vecCol) as (pos0, x)")
      .selectExpr("pos0 + 1 as pos", "cast(x as double) as x")
      .groupBy("pos")
      .agg(min("x").as("mn"), max("x").as("mx"))

  def trainStatsSql(relation: String, vecCol: String, dim: Int): String =
    s"""SELECT i AS pos, min($vecCol[i]::DOUBLE) AS mn, max($vecCol[i]::DOUBLE) AS mx
       |FROM $relation, range(1, ${dim + 1}) t(i) GROUP BY i""".stripMargin

  /** Single broadcast row: mns, scales arrays ordered by dimension. */
  def statsRow(emb: DataFrame, vecCol: String): DataFrame =
    trainStats(emb, vecCol).agg(
      expr("transform(array_sort(collect_list(struct(pos, mn))), s -> s.mn) as mns"),
      expr(s"transform(array_sort(collect_list(struct(pos, mx, mn))), s -> (s.mx - s.mn) / $Levels) as scales"))

  /** Encode expression over `vecCol` given mns/scales columns in scope. */
  def encodeExpr(vecCol: String, dim: Int): String =
    s"transform(sequence(1, $dim), qi -> cast(least($Levels, greatest(0.0, " +
      s"coalesce(round((cast(element_at($vecCol, qi) as double) - element_at(mns, qi))" +
      s" / nullif(element_at(scales, qi), 0.0), 0), 0.0))) as int))"

  def encodeSql(vecCol: String, dim: Int): String =
    s"list_transform(range(1, ${dim + 1}), qi -> (least($Levels, greatest(0.0, " +
      s"coalesce(round(($vecCol[qi]::DOUBLE - mns[qi]) / nullif(scales[qi], 0.0), 0), 0.0))))::INT)"

  /** Encode-then-decode of one element, fused (see [[searchL2]] PERF note). */
  private def encodedElem(vecCol: String): String =
    s"least($Levels, greatest(0.0, coalesce(round((cast(element_at($vecCol, qi) as double)" +
      s" - element_at(mns, qi)) / nullif(element_at(scales, qi), 0.0), 0), 0.0)))"

  /** Reconstructed (encode∘decode) array of `vecCol` given mns/scales in
    * scope — the reference's decode(), `quantization.py:129-139`. */
  def decodeExpr(vecCol: String, dim: Int): String =
    s"transform(sequence(1, $dim), qi -> " +
      s"${encodedElem(vecCol)} * element_at(scales, qi) + element_at(mns, qi))"

  def decodeSql(vecCol: String, dim: Int): String =
    s"list_transform(range(1, ${dim + 1}), qi -> least($Levels, greatest(0.0, " +
      s"coalesce(round(($vecCol[qi]::DOUBLE - mns[qi]) / nullif(scales[qi], 0.0), 0), 0.0)))" +
      s" * scales[qi] + mns[qi])"

  /** Metric dispatcher — the reference's three SQ distances
    * (`quantization.py:145-181`). */
  def search(emb: DataFrame, vecCol: String, idCol: String,
      queryVec: Seq[Double], dim: Int, k: Int, metric: String): DataFrame =
    metric match {
      case "l2"     => searchL2(emb, vecCol, idCol, queryVec, dim, k)
      case "cosine" => searchCosine(emb, vecCol, idCol, queryVec, dim, k)
      case "dot"    => searchDot(emb, vecCol, idCol, queryVec, dim, k)
      case m => throw new IllegalArgumentException(s"metric $m")
    }

  /** Approx-L2 search: encode the corpus, decode codes, L2 to the query.
    * Returns (id, score) top-k, ascending.
    */
  def searchL2(
      emb: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Double],
      dim: Int,
      k: Int): DataFrame = {
    val qvLit = queryVec.mkString("array(", "D, ", "D)")
    // Encode, decode, and distance are FUSED into one per-element pass:
    // a separate `code` column gets CollapseProject-inlined into the
    // distance lambda and re-evaluates the whole 64-element encode once
    // per distance element (64×64 evals/row — measured 5 s warm at
    // 2000 rows; fused ≈ 64 evals/row).
    emb
      .crossJoin(broadcast(statsRow(emb, vecCol)))
      .selectExpr(idCol,
        s"""round(sqrt(aggregate(transform(sequence(1, $dim), qi ->
           |  pow(${encodedElem(vecCol)} * element_at(scales, qi) + element_at(mns, qi)
           |      - element_at($qvLit, qi), 2.0)),
           |  0D, (a, b) -> a + b)), 6) as score""".stripMargin)
      .orderBy(col("score"), col(idCol))
      .limit(k)
  }

  /** Approx-cosine over reconstructed vectors, the query passed through
    * the quantizer too and both norms guarded with the reference's 1e-8
    * (`distances_cosine`, `quantization.py:154-173`). The decoded array is
    * materialized once per row (referenced 3× so CollapseProject keeps
    * it); dot/norms run through the codegen'd kernel. Ascending top-k. */
  def searchCosine(
      emb: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Double],
      dim: Int,
      k: Int): DataFrame = {
    val qvLit = queryVec.mkString("array(", "D, ", "D)")
    val srow = statsRow(emb, vecCol)
      .selectExpr("mns", "scales", s"${decodeExpr(qvLit, dim)} as qdec")
      .withColumn("qnorm",
        sqrt(VectorFunctions.vecDot(col("qdec"), col("qdec"))) + lit(1e-8))
    emb
      .crossJoin(broadcast(srow))
      .withColumn("dec", expr(decodeExpr(vecCol, dim)))
      .select(col(idCol),
        round(lit(1.0) -
          VectorFunctions.vecDot(col("dec"), col("qdec")) /
            ((sqrt(VectorFunctions.vecDot(col("dec"), col("dec"))) + lit(1e-8))
              * col("qnorm")), 6).as("score"))
      .orderBy(col("score"), col(idCol))
      .limit(k)
  }

  /** Approx-dot "distance" = −dot of the reconstructed vectors
    * (`distances_dot`, `quantization.py:175-181`, `:239-251`). */
  def searchDot(
      emb: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Double],
      dim: Int,
      k: Int): DataFrame = {
    val qvLit = queryVec.mkString("array(", "D, ", "D)")
    val srow = statsRow(emb, vecCol)
      .selectExpr("mns", "scales", s"${decodeExpr(qvLit, dim)} as qdec")
    emb
      .crossJoin(broadcast(srow))
      .withColumn("dec", expr(decodeExpr(vecCol, dim)))
      .select(col(idCol),
        round(-VectorFunctions.vecDot(col("dec"), col("qdec")), 6).as("score"))
      .orderBy(col("score"), col(idCol))
      .limit(k)
  }

  private def srowSql(relation: String, vecCol: String, dim: Int,
      queryVecSql: String): String =
    s"""st AS (${trainStatsSql(relation, vecCol, dim)}),
       |srow AS (SELECT list(mn ORDER BY pos) AS mns,
       |                list((mx - mn) / $Levels ORDER BY pos) AS scales
       |         FROM st),
       |q AS (SELECT $queryVecSql AS v),
       |qd AS (SELECT mns, scales, ${decodeSql("q.v", dim)} AS qdec
       |       FROM srow, q)""".stripMargin

  def searchCosineSql(
      relation: String, vecCol: String, idCol: String,
      queryVecSql: String, dim: Int, k: Int): String =
    s"""WITH ${srowSql(relation, vecCol, dim, queryVecSql)},
       |qn AS (SELECT mns, scales, qdec,
       |              sqrt(${VectorFunctions.dotSql("qdec", "qdec", dim)}) + 1e-8 AS qnorm
       |       FROM qd),
       |dec AS (SELECT $idCol, ${decodeSql(vecCol, dim)} AS dec, qdec, qnorm
       |        FROM $relation, qn)
       |SELECT $idCol,
       |  round(1.0 - ${VectorFunctions.dotSql("dec", "qdec", dim)} /
       |    ((sqrt(${VectorFunctions.dotSql("dec", "dec", dim)}) + 1e-8) * qnorm), 6) AS score
       |FROM dec ORDER BY score, $idCol LIMIT $k""".stripMargin

  def searchDotSql(
      relation: String, vecCol: String, idCol: String,
      queryVecSql: String, dim: Int, k: Int): String =
    s"""WITH ${srowSql(relation, vecCol, dim, queryVecSql)},
       |dec AS (SELECT $idCol, ${decodeSql(vecCol, dim)} AS dec, qdec
       |        FROM $relation, qd)
       |SELECT $idCol,
       |  round(- ${VectorFunctions.dotSql("dec", "qdec", dim)}, 6) AS score
       |FROM dec ORDER BY score, $idCol LIMIT $k""".stripMargin

  def searchL2Sql(
      relation: String, vecCol: String, idCol: String,
      queryVecSql: String, dim: Int, k: Int): String =
    s"""WITH st AS (${trainStatsSql(relation, vecCol, dim)}),
       |srow AS (SELECT list(mn ORDER BY pos) AS mns,
       |                list((mx - mn) / $Levels ORDER BY pos) AS scales
       |         FROM st),
       |q AS (SELECT $queryVecSql AS v),
       |enc AS (SELECT $idCol, mns, scales, ${encodeSql(vecCol, dim)} AS code
       |        FROM $relation, srow)
       |SELECT $idCol,
       |  round(sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), qi ->
       |    pow(code[qi] * scales[qi] + mns[qi] - q.v[qi], 2.0))),
       |    (a, b) -> a + b)), 6) AS score
       |FROM enc, q
       |ORDER BY score, $idCol LIMIT $k""".stripMargin
}
