package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall breakdown of `media_card` at an arbitrary
  * corpus dir — attributes a decade-scale wall ratio to its branches
  * (image decode+phash, near-dup pair join, audio decode, video frame
  * sample) instead of guessing from the fused number (VERDICT r12 #1).
  * Usage: runMain graft.tools.ProbeMediaCard <dir> [reps]
  */
object ProbeMediaCard {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val docs = graft.core.Tables.documents(spark, dir)
    import graft.media.Multimodal
    import graft.queries.MediaQueries.corruptPayloads
    def timed(label: String)(f: => Long): Unit = {
      val xs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        System.gc()
        (dt, n)
      }
      println(f"[probe] $label%-22s min=${xs.map(_._1).min}%8.3f s " +
        f"reps=${xs.map(x => f"${x._1}%.3f").mkString(",")} rows=${xs.head._2}")
    }
    println(s"[probe] dir=$dir docs=${docs.count()}")
    timed("img_decode_phash") {
      Multimodal.imagePhash(
        corruptPayloads(Multimodal.syntheticPhashImages(docs))).toDF().count()
    }
    val img = Multimodal.imagePhash(
      corruptPayloads(Multimodal.syntheticPhashImages(docs))).toDF()
      .localCheckpoint()
    val ok = img.filter(col("phash_lo") =!= -1L || col("phash_hi") =!= -1L)
    timed("pair_join_from_ckpt") {
      Multimodal.phashNearDupPairs(ok, maxHamming = 8).count()
    }
    timed("audio_features") {
      Multimodal.audioFeatures(
        corruptPayloads(Multimodal.syntheticAudio(docs)), 16).toDF().count()
    }
    timed("video_frame_sample") {
      Multimodal.frameSample(
        corruptPayloads(Multimodal.syntheticVideos(docs)), 3).toDF().count()
    }
    timed("full_card") {
      graft.Catalog.byName("media_card").run(spark, dir).count()
    }
    spark.stop()
  }
}
