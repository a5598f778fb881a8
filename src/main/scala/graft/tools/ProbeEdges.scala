package graft.tools

import org.apache.spark.sql.SparkSession
import graft.dedup.{BucketGuard, Dedup}

/** One-off probe: verified-edge counts feeding nearDupComponents at a
  * given corpus dir, to size the union-find escape hatch cap from
  * measured data (ADVICE r11 medium). Not part of any catalog entry.
  */
object ProbeEdges {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val docs = graft.core.Tables.documents(spark, dir)
      val ds = Dedup.docSignatures(docs).localCheckpoint()
      val cand = BucketGuard
        .candidatePairs(Dedup.bandRows(ds), "doc_id",
          Seq("band", "sig"), "fsig", BucketGuard.DefaultCap)
        .toDF("x", "y")
      // verified edges via the SAME frame nearDupComponents decides on
      // (componentEdges). The candidates count above remains a local
      // mirror of the generation step — it exists only to size the cap
      // and is NOT the hatch's deciding quantity; `verified` is.
      val pairs = Dedup.componentEdges(docs)
      println(s"[probe-edges] dir=$dir candidates=${cand.count()} " +
        s"verified=${pairs.count()} nodes=${
          pairs.select("x").union(pairs.select("y")).distinct().count()}")
    }
    spark.stop()
  }
}
