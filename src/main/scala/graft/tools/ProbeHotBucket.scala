package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage wall/cardinality breakdown of the
  * `dedup_hot_bucket` sweep (signatures → guarded candidates → exact
  * scoring → component propagation) at an arbitrary corpus dir — tells
  * which stage an extended-series drift lives in, replacing the ad-hoc
  * profiling r10 did by hand (SURVEY §6.6).
  * Usage: runMain graft.tools.ProbeHotBucket <dir>
  */
object ProbeHotBucket {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $l%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = t("corpus") {
      graft.dedup.HotBucket.corpus(spark, args(0)).localCheckpoint()
    }
    val ds = t("signatures") {
      graft.dedup.Dedup.docSignatures(docs).localCheckpoint()
    }
    val cand = t("candidates") {
      val c = graft.dedup.BucketGuard.candidatePairs(
        graft.dedup.Dedup.bandRows(ds), "doc_id", Seq("band", "sig"),
        "fsig").toDF("x", "y").localCheckpoint()
      println(s"[probe] n_cand=${c.count()}"); c
    }
    val pairs = t("score+filter") {
      val p = graft.dedup.Dedup.scorePairs(cand, ds, "x", "y")
        .filter(col("ni").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("ni")) >=
          graft.dedup.Dedup.ComponentJaccard)
        .select("x", "y").localCheckpoint()
      println(s"[probe] n_pairs=${p.count()}"); p
    }
    val nNodes = pairs.select(col("x").as("n"))
      .union(pairs.select(col("y").as("n"))).distinct().count()
    println(s"[probe] nodes=$nNodes graphRows=${nNodes + 2 * pairs.count()}")
    t("components_e2e") { graft.dedup.Dedup.nearDupComponents(docs).count() }
    // warm pass: same stages again in the same JVM — separates per-plan
    // codegen/C2 cost (cold-only) from per-execution stage latency
    t("warm_signatures") {
      graft.dedup.Dedup.docSignatures(docs).localCheckpoint()
    }
    t("warm_candidates") {
      graft.dedup.BucketGuard.candidatePairs(
        graft.dedup.Dedup.bandRows(ds), "doc_id", Seq("band", "sig"),
        "fsig").count()
    }
    t("warm_e2e") { graft.dedup.Dedup.nearDupComponents(docs).count() }
    t("warm_report") { graft.dedup.HotBucket.report(spark, args(0)).count() }
    spark.stop()
  }
}
