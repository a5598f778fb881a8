package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.core.AsOfJoin
import graft.stream.StreamAsOf

/** Streaming as-of enrichment vs the batch as-of join: with the right
  * side arriving in order (the CDC regime), the streamed result over
  * multiple micro-batches equals the batch operator on the union. */
class StreamAsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("multi-batch streamed enrichment equals the batch as-of join") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // batch 1 times in [0, 100), batch 2 in [100, 200): in-order arrival
    def mk(lo: Int, n: Int, eidBase: Int) = (0 until n).map { i =>
      (rnd.nextInt(3).toLong + 1L, (lo + rnd.nextInt(100)).toLong,
        if (rnd.nextBoolean()) 0 else 1, (eidBase + i).toLong,
        rnd.nextInt(1000).toDouble)
    }
    val b1 = mk(0, 60, 0)
    val b2 = mk(100, 60, 1000)
    val src = Files.createTempDirectory("graft_stream_asof").toString
    val cols = Seq("k", "t", "side", "eid", "v")
    b1.toDF(cols: _*).coalesce(1).write.parquet(s"$src/d1")
    val stream = spark.readStream
      .schema(b1.toDF(cols: _*).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/d*")
    val q = StreamAsOf.enrich(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_sink").start()
    try {
      q.processAllAvailable()
      b2.toDF(cols: _*).coalesce(1).write.parquet(s"$src/d2")
      q.processAllAvailable()
      val got = spark.table("asof_sink")
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .toMap
      // batch reference over the union
      val all = (b1 ++ b2)
      val left = all.filter(_._3 == 1).map(e => (e._4, e._1, e._2))
        .toDF("eid", "k", "t")
      val right = all.filter(_._3 == 0).map(e => (e._4, e._1, e._2, e._5))
        .toDF("eid", "k", "t", "v")
      val want = AsOfJoin.asof(left, right, "k", "t", tieBreak = "eid",
          payloadCols = Seq("v"))
        .collect()
        .map(r => r.getLong(r.fieldIndex("eid")) ->
          (if (r.isNullAt(r.fieldIndex("asof_v"))) None
           else Some(r.getDouble(r.fieldIndex("asof_v")))))
        .toMap
      assert(got == want && got.nonEmpty)
      assert(got.values.exists(_.isDefined)) // matches actually happen
    } finally q.stop()
  }
}
