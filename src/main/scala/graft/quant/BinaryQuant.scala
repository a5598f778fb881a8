package graft.quant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binary quantization (f32 → 1 bit/dim) with Hamming search — the
  * reference's `BinaryQuantizer` (jcolano/fastpyvectordb
  * `quantization.py:307-394`): per-dim exact-median thresholds, sign bits
  * packed into 32-bit words, XOR + popcount distance.
  *
  * A 64-dim vector packs to two BIGINT words; Hamming search is then two
  * `bit_count(xor(..))` integer ops per row — fully codegen'd, no arrays
  * touched at scan time. Exact `percentile` (not percentile_approx) keeps
  * the thresholds bit-identical with DuckDB's `quantile_cont`.
  */
object BinaryQuant {
  val WordBits = 32

  /** Per-dim exact median thresholds (pos 1-based, thr). */
  def thresholds(emb: DataFrame, vecCol: String): DataFrame =
    emb
      .selectExpr(s"posexplode($vecCol) as (pos0, x)")
      .selectExpr("pos0 + 1 as pos", "cast(x as double) as x")
      .groupBy("pos")
      .agg(expr("percentile(x, 0.5)").as("thr"))

  def thresholdsSql(relation: String, vecCol: String, dim: Int): String =
    s"""SELECT i AS pos, quantile_cont($vecCol[i]::DOUBLE, 0.5) AS thr
       |FROM $relation, range(1, ${dim + 1}) t(i) GROUP BY i""".stripMargin

  /** Single row with the threshold array ordered by dimension. */
  def thresholdRow(emb: DataFrame, vecCol: String): DataFrame =
    thresholds(emb, vecCol).agg(
      expr("transform(array_sort(collect_list(struct(pos, thr))), s -> s.thr) as thrs"))

  /** Packed word w: bits (base+1)..(base+32) of the sign vector. */
  def packWordExpr(vecCol: String, base: Int): String =
    s"aggregate(transform(sequence(1, $WordBits), bi -> " +
      s"case when cast(element_at($vecCol, $base + bi) as double) > element_at(thrs, $base + bi) " +
      s"then shiftleft(1L, bi - 1) else 0L end), 0L, (a, b) -> a + b)"

  def packWordSql(vecCol: String, base: Int): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(range(1, ${WordBits + 1}), bi -> " +
      s"case when $vecCol[$base + bi]::DOUBLE > thrs[$base + bi] " +
      s"then (1::BIGINT << (bi - 1)) else 0::BIGINT end)), (a, b) -> a + b)"

  /** Driver-side query packing against collected thresholds (the exact
    * integer twin of [[packWordExpr]]). */
  def packQueryWord(queryVec: Seq[Double], thrs: Seq[Double], base: Int): Long =
    (0 until WordBits).foldLeft(0L)((acc, bi) =>
      if (queryVec(base + bi) > thrs(base + bi)) acc + (1L << bi) else acc)

  /** Hamming top-k of the packed corpus against a packed query (dim=64 →
    * two words). Returns (id, hamming).
    */
  def searchHamming(
      emb: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Double],
      dim: Int,
      k: Int): DataFrame = {
    require(dim == 2 * WordBits, s"packed layout expects dim=${2 * WordBits}")
    // The thresholds are one tiny aggregated row: collect it ONCE and use
    // the collected values both to pack the query on the driver and as a
    // literal `thrs` column for the corpus-side packing — per-row work is
    // then only the packing plus two xor/popcounts, and the full
    // per-dimension exact-percentile aggregation job runs a single time
    // (previously it ran twice: once collected, once as a crossJoin).
    val thrs = thresholdRow(emb, vecCol).collect()(0)
      .getSeq[Double](0)
    val (qw0, qw1) =
      (packQueryWord(queryVec, thrs, 0), packQueryWord(queryVec, thrs, WordBits))
    val packed = emb
      .withColumn("thrs", typedlit(thrs))
      .selectExpr(idCol,
        s"${packWordExpr(vecCol, 0)} as w0",
        s"${packWordExpr(vecCol, WordBits)} as w1")
    packed
      .selectExpr(idCol,
        s"cast(bit_count(w0 ^ ${qw0}L) + bit_count(w1 ^ ${qw1}L) as int) as hamming")
      .orderBy(col("hamming"), col(idCol))
      .limit(k)
  }

  def searchHammingSql(
      relation: String, vecCol: String, idCol: String,
      queryVecSql: String, dim: Int, k: Int): String = {
    require(dim == 2 * WordBits)
    s"""WITH th AS (${thresholdsSql(relation, vecCol, dim)}),
       |trow AS (SELECT list(thr ORDER BY pos) AS thrs FROM th),
       |q AS (SELECT $queryVecSql AS v),
       |packed AS (
       |  SELECT $idCol,
       |         ${packWordSql(vecCol, 0)} AS w0,
       |         ${packWordSql(vecCol, WordBits)} AS w1,
       |         ${packWordSql("q.v", 0)} AS qw0,
       |         ${packWordSql("q.v", WordBits)} AS qw1
       |  FROM $relation, trow, q)
       |SELECT $idCol,
       |       (bit_count(xor(w0, qw0)) + bit_count(xor(w1, qw1)))::INT AS hamming
       |FROM packed
       |ORDER BY hamming, $idCol LIMIT $k""".stripMargin
  }
}
