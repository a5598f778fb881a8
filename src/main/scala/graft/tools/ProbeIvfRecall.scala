package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: trained-IVF (nprobe=4/16) hit count vs the exact cosine
  * top-10 — the raw number behind `ann_ivf_trained`'s boolean gate, for
  * auditing floor margin at alternate-scale draws (r13).
  * Usage: runMain graft.tools.ProbeIvfRecall <dir>...
  */
object ProbeIvfRecall {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val D = graft.core.Tables.EmbeddingDim
    val K = 10
    for (dir <- args) {
      val e = graft.core.Tables.embeddings(spark, dir)
      val m = graft.knn.Ann.trainIvf(e, "embedding", graft.index.Indexes.IvfCells)
      val qv = graft.functions.VectorFunctions.hashVectorValues(11L, D)
      val approx = graft.knn.Ann.ivfSearch(e, "embedding", "vec_id", m, qv,
        nprobe = 4, K).select("vec_id")
      val exact = graft.knn.Knn.search(e, col("embedding"), typedlit(qv),
        "cosine", K).select("vec_id")
      val hits = approx.join(exact, "vec_id").count()
      println(s"[probe-ivf] dir=$dir vecs=${e.count()} hits=$hits/$K (floor 3)")
    }
    spark.stop()
  }
}
