package graft.quant

/** Deterministic driver-side Lloyd's iteration for codebook training on
  * bounded samples.
  *
  * MLlib's KMeans schedules ~one Spark job per iteration; on a few
  * thousand sampled rows that is pure scheduling overhead (measured:
  * 8 subspace fits ≈ 17 s at sf0.1, &lt;100 ms locally). Quantizer /
  * coarse-cell training always runs on a driver-sized sample — the
  * reference subsamples too (quantization.py:472-478) — so the engine
  * trains locally when the sample fits and falls back to MLlib above the
  * threshold (see ProductQuant/Ann), keeping the 100 TB path intact.
  *
  * Determinism: points are sorted lexicographically before init, init
  * picks k evenly spaced points, ties in assignment go to the lowest
  * centroid index, and empty clusters keep their previous centroid.
  */
object LocalKMeans {

  def fit(pointsIn: Seq[Seq[Double]], k: Int, iters: Int): Seq[Seq[Double]] = {
    require(pointsIn.nonEmpty, "empty training sample")
    val points: Array[Array[Double]] =
      pointsIn.map(_.toArray).toArray
        .sortWith((a, b) => lexLt(a, b))
    val n = points.length
    val dim = points(0).length
    val kk = math.min(k, n)
    var centroids: Array[Array[Double]] =
      Array.tabulate(kk)(i => points(((i.toLong * (n - 1)) / math.max(1, kk - 1)).toInt).clone())

    var iter = 0
    while (iter < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      var p = 0
      while (p < n) {
        val pt = points(p)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          var d = 0.0; var i = 0
          val ct = centroids(c)
          while (i < dim) { val x = pt(i) - ct(i); d += x * x; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best); var i = 0
        while (i < dim) { s(i) += pt(i); i += 1 }
        counts(best) += 1
        p += 1
      }
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          val ct = centroids(c); val s = sums(c); var i = 0
          while (i < dim) { ct(i) = s(i) / counts(c); i += 1 }
        } // empty cluster: keep previous centroid
        c += 1
      }
      iter += 1
    }
    centroids.toSeq.map(_.toSeq)
  }

  private def lexLt(a: Array[Double], b: Array[Double]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      if (a(i) < b(i)) return true
      if (a(i) > b(i)) return false
      i += 1
    }
    a.length < b.length
  }
}
