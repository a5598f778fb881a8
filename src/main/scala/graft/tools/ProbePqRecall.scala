package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: trained-PQ ADC overlap vs the exact top-(k·5) pool at an
  * arbitrary corpus dir — the raw number behind `pq_trained`'s boolean
  * gate, for adjudicating whether a failed draw is a degraded trained
  * path or floor calibration vs corpus geometry (r13: first rotating
  * 30× draw). Usage: runMain graft.tools.ProbePqRecall <dir> [reps]
  */
object ProbePqRecall {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val D = graft.core.Tables.EmbeddingDim
    val K = 10
    val e = graft.core.Tables.embeddings(spark, dir)
    println(s"[probe-pq] dir=$dir vecs=${e.count()}")
    val ks = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq
      else Seq(16)
    for (rep <- 1 to reps; kk <- ks) {
      val cb = graft.quant.ProductQuant.train(e, "embedding", D, m = 8, k = kk)
      println(s"[probe-pq] k=$kk")
      val qv = graft.functions.VectorFunctions.hashVectorValues(11L, D)
      val approx = graft.quant.ProductQuant
        .searchAdc(e, "embedding", "vec_id", cb, qv, K).select("vec_id")
      Seq(K, K * 5, K * 20).foreach { pool =>
        val exact = graft.knn.Knn.search(e, col("embedding"),
          typedlit(qv), "l2", pool).select("vec_id")
        val hits = approx.join(exact, "vec_id").count()
        println(s"[probe-pq] rep=$rep pool=$pool hits=$hits/$K")
      }
    }
    spark.stop()
  }
}
