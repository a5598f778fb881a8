package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: bucket-size distribution of the banded LSH self-join at an
  * arbitrary corpus dir — tells whether BucketGuard's cap engages there.
  * Usage: runMain graft.tools.ProbeBuckets <dir>
  */
object ProbeBuckets {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"${args(0)}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val bands = graft.index.LshIndex.bucketRows(
      emb, "embedding", "vec_id", graft.core.Tables.EmbeddingDim,
      withFullSig = true)
    val sizes = bands.groupBy("band_idx", "band_val").count()
    println("[probe] vecs=" + emb.count())
    println("[probe] buckets_over_cap_1024=" +
      sizes.filter(col("count") > graft.dedup.BucketGuard.DefaultCap).count())
    println("[probe] max_bucket=" + sizes.agg(max("count")).head.getLong(0))
    spark.stop()
  }
}
