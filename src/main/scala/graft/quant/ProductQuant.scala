package graft.quant

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (f32[D] → M 8-bit codes) with ADC search — the
  * reference's `ProductQuantizer` (jcolano/fastpyvectordb
  * `quantization.py:444-597`): k-means per subspace, nearest-centroid
  * encode, per-query lookup-table distance.
  *
  * Spark-first shape: training is MLlib `KMeans` per subspace (the
  * reference hand-rolls Lloyd's); the trained codebooks are tiny
  * (M·K·D/M doubles) so encode and the per-query ADC LUT become literal
  * arrays in codegen'd expressions — search never joins, it's a scan +
  * Σ_m lut[m][code_m] + TakeOrderedAndProject. At 100 TB the codes table
  * (M bytes/vector) replaces the raw vectors for the candidate scan.
  *
  * No DuckDB oracle: k-means iteration order isn't SQL-reproducible; the
  * recall gate in QuantSpec pins behavior against exact kNN instead.
  */
object ProductQuant {

  /** cb(m)(k)(d): M codebooks of K centroids each. */
  final case class Codebooks(m: Int, k: Int, subDim: Int,
      cb: Seq[Seq[Seq[Double]]])

  def train(emb: DataFrame, vecCol: String, dim: Int, m: Int, k: Int,
      seed: Long = 42L): Codebooks = {
    require(dim % m == 0, s"dim $dim not divisible by M=$m")
    val subDim = dim / m
    val cbs = (0 until m).map { mi =>
      val sub = emb.selectExpr(
        s"transform(slice($vecCol, ${mi * subDim + 1}, $subDim), x -> cast(x as double)) as sub")
      val feats = sub.select(array_to_vector(col("sub")).as("features"))
      val model = new KMeans()
        .setK(k).setSeed(seed).setMaxIter(20).setFeaturesCol("features")
        .fit(feats)
      model.clusterCenters.toSeq.map(_.toArray.toSeq)
    }
    Codebooks(m, k, subDim, cbs)
  }

  /** Squared L2 between a subvector expression and one centroid. */
  private def subDistExpr(vecCol: String, base: Int, centroid: Seq[Double]): String =
    centroid.zipWithIndex.map { case (c, d) =>
      s"pow(cast(element_at($vecCol, ${base + d + 1}) as double) - ($c), 2.0)"
    }.mkString(" + ")

  /** Encode: per subspace, argmin centroid index (0-based). */
  def encodeExpr(vecCol: String, cb: Codebooks): String = {
    val codes = (0 until cb.m).map { mi =>
      val base = mi * cb.subDim
      val dists = cb.cb(mi).map(c => subDistExpr(vecCol, base, c))
        .mkString("array(", ", ", ")")
      s"cast(array_position($dists, array_min($dists)) - 1 as int)"
    }
    codes.mkString("array(", ", ", ")")
  }

  /** ADC search: LUT computed driver-side from the query, distance =
    * sqrt(Σ_m lut[m][code_m]). Returns (id, score) ascending top-k.
    */
  def searchAdc(
      emb: DataFrame,
      vecCol: String,
      idCol: String,
      cb: Codebooks,
      queryVec: Seq[Double],
      k: Int): DataFrame = {
    val lut: Seq[Seq[Double]] = (0 until cb.m).map { mi =>
      val base = mi * cb.subDim
      cb.cb(mi).map { c =>
        c.zipWithIndex.map { case (cv, d) =>
          val q = queryVec(base + d); (q - cv) * (q - cv)
        }.sum
      }
    }
    val lutLit = lut.map(_.mkString("array(", "D, ", "D)"))
      .mkString("array(", ", ", ")")
    val encoded = emb.selectExpr(idCol, s"${encodeExpr(vecCol, cb)} as codes")
    encoded
      .selectExpr(idCol,
        s"""round(sqrt(aggregate(transform(sequence(0, ${cb.m - 1}), mi ->
           |  element_at(element_at($lutLit, mi + 1), element_at(codes, mi + 1) + 1)),
           |  0D, (a, b) -> a + b)), 6) as score""".stripMargin)
      .orderBy(col("score"), col(idCol))
      .limit(k)
  }
}
