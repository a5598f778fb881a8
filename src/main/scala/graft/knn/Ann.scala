package graft.knn

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor scale paths. Exact kNN (Knn.search) is
  * the correctness baseline; these two prune candidates before the exact
  * rerank, which is what survives a 100 TB corpus:
  *
  *  - **LSH** (random hyperplane signs): 16 sign bits from deterministic
  *    hash-vector hyperplanes, banded 4×4; a query probes rows sharing
  *    any band value, then exact-reranks. Signature computation is pure
  *    dot-product arithmetic → full DuckDB oracle. At scale the banded
  *    signature is a join key (explode bands → shuffle join); the
  *    single-query form here is one scan with an OR-of-4 filter, no
  *    shuffle at all.
  *  - **IVF** (inverted file): MLlib KMeans coarse centroids; rows carry
  *    an argmin cell id, a query probes the nprobe nearest cells and
  *    exact-reranks inside them. Cell assignment is a literal-codebook
  *    expression (no join); at scale the table would be written
  *    partitioned by cell so probing prunes whole files.
  */
object Ann {
  val SigBits = 16
  val Bands = 4
  val BandBits: Int = SigBits / Bands
  /** Hyperplane h_i = hashVector(HyperplaneKeyBase + i), i = 0..15. */
  val HyperplaneKeyBase = 1000L

  private def hyperplane(i: Int, dim: Int): Seq[Double] =
    VectorFunctions.hashVectorValues(HyperplaneKeyBase + i, dim)

  /** Band value b (0..3) of a vector column: 4 sign bits packed. */
  def bandCol(vec: Column, b: Int, dim: Int): Column =
    (0 until BandBits).map { j =>
      val h = typedlit(hyperplane(b * BandBits + j, dim))
      when(VectorFunctions.vecDot(vec, h) > 0.0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  def bandSql(vecExpr: String, b: Int, dim: Int): String =
    (0 until BandBits).map { j =>
      val h = VectorFunctions.hashVectorSql((HyperplaneKeyBase + b * BandBits + j).toString, dim)
      s"(case when ${VectorFunctions.dotSql(vecExpr, h, dim)} > 0.0 then ${1 << j} else 0 end)"
    }.mkString("(", " + ", ")")

  /** LSH search: any-band-match candidates → exact cosine rerank. */
  def lshSearch(
      emb: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Double],
      dim: Int,
      k: Int): DataFrame = {
    val qv = typedlit(queryVec)
    val spark = emb.sparkSession
    // Query band values through the engine (same arithmetic as the data).
    val qBands = spark.range(1).select(
      (0 until Bands).map(b => bandCol(qv, b, dim).as(s"qb$b")): _*)
    val withBands = emb.select(
      Seq(col(idCol), col(vecCol)) ++
        (0 until Bands).map(b => bandCol(col(vecCol), b, dim).as(s"b$b")): _*)
    val anyBand = (0 until Bands)
      .map(b => col(s"b$b") === col(s"qb$b"))
      .reduce(_ || _)
    withBands
      .crossJoin(broadcast(qBands))
      .filter(anyBand)
      .withColumn("score",
        round(VectorFunctions.cosineDistance(col(vecCol), qv), 6))
      .select(idCol, "score")
      .orderBy(col("score"), col(idCol))
      .limit(k)
  }

  def lshSearchSql(
      relation: String, vecCol: String, idCol: String,
      queryVecSql: String, dim: Int, k: Int): String = {
    val qb = (0 until Bands).map(b => s"${bandSql("q.v", b, dim)} AS qb$b")
    val db = (0 until Bands).map(b => s"${bandSql(vecCol, b, dim)} AS b$b")
    val anyBand = (0 until Bands).map(b => s"d.b$b = qb.qb$b").mkString(" OR ")
    s"""WITH q AS (SELECT $queryVecSql AS v),
       |qb AS (SELECT ${qb.mkString(", ")} FROM q),
       |d AS (SELECT $idCol, $vecCol, ${db.mkString(", ")} FROM $relation),
       |cand AS (SELECT d.$idCol, d.$vecCol FROM d, qb WHERE $anyBand)
       |SELECT $idCol,
       |  round(${VectorFunctions.cosineDistanceSql(vecCol, "q.v", dim)}, 6) AS score
       |FROM cand, q ORDER BY score, $idCol LIMIT $k""".stripMargin
  }

  // ---- IVF --------------------------------------------------------------

  final case class IvfModel(centroids: Seq[Seq[Double]])

  def trainIvf(emb: DataFrame, vecCol: String, cells: Int,
      seed: Long = 42L): IvfModel = {
    val feats = emb.selectExpr(
        s"transform($vecCol, x -> cast(x as double)) as f")
      .select(array_to_vector(col("f")).as("features"))
    val model = new KMeans().setK(cells).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features").fit(feats)
    IvfModel(model.clusterCenters.toSeq.map(_.toArray.toSeq))
  }

  /** Argmin-cell expression against the literal centroid codebook. */
  def cellExpr(vecCol: String, m: IvfModel): String = {
    val dists = m.centroids.map { c =>
      c.zipWithIndex.map { case (cv, d) =>
        s"pow(cast(element_at($vecCol, ${d + 1}) as double) - ($cv), 2.0)"
      }.mkString(" + ")
    }.mkString("array(", ", ", ")")
    s"cast(array_position($dists, array_min($dists)) - 1 as int)"
  }

  /** IVF search: probe the nprobe nearest cells, exact-rerank inside. */
  def ivfSearch(
      emb: DataFrame,
      vecCol: String,
      idCol: String,
      m: IvfModel,
      queryVec: Seq[Double],
      nprobe: Int,
      k: Int): DataFrame = {
    val probeCells = m.centroids.zipWithIndex.map { case (c, i) =>
      val d = c.zip(queryVec).map { case (a, b) => (a - b) * (a - b) }.sum
      (d, i)
    }.sortBy(_._1).take(nprobe).map(_._2)
    val qv = typedlit(queryVec)
    emb
      .withColumn("cell", expr(cellExpr(vecCol, m)))
      .filter(col("cell").isin(probeCells: _*))
      .withColumn("score",
        round(VectorFunctions.cosineDistance(col(vecCol), qv), 6))
      .select(idCol, "score")
      .orderBy(col("score"), col(idCol))
      .limit(k)
  }
}
