package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.stream.StatefulDedup

/** Pins the determinism argument the `stream_dedup_live` catalog entry's
  * oracle rests on: first-seen-batch-wins dedup is batch-order DEPENDENT
  * in general, but with the source hash-partitioned ON THE KEY every
  * key's rows land in one file — hence one micro-batch — and the emitted
  * row is the key's global minimum whatever the trigger size groups the
  * files into.
  */
class StreamLiveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("key-partitioned stateful dedup is batch-split invariant") {
    import spark.implicits._
    val rows = (1 to 200).map(i => ((i % 17).toLong, i.toLong, s"t${i % 3}"))
    val df = rows.toDF("user_id", "event_id", "event_type")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val src = Files.createTempDirectory("graft_sdl").toString
    df.repartition(8, col("user_id")).write.mode("overwrite").parquet(src)

    def run(mft: Int): Seq[(Long, Long, String)] = {
      val stream = spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", mft).parquet(src)
      val name = s"sdl_sink_$mft"
      val q = StatefulDedup.firstSeenByKey(stream, "user_id").toDF()
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name).as[(Long, Long, String)]
        .collect().sortBy(_._1).toSeq
    }

    // 8 single-file batches vs 2 four-file batches: same result
    val one = run(1)
    val four = run(4)
    assert(one == four)
    // ... and it is the GLOBAL min per key (the oracle's min/arg_min)
    val expected = rows.groupBy(_._1).map { case (k, g) =>
      val m = g.minBy(_._2); (k, m._2, m._3)
    }.toSeq.sortBy(_._1)
    assert(one == expected)
  }

  test("stream_tumbling_live scopes its state width to a child session") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val n = Catalog.byName("stream_tumbling_live")
      .run(spark, SparkTestSession.sf).count()
    assert(n > 0)
    // the width-8 tuning must live on the memoized child only — the
    // shared session's conf is untouched (the sql_ann_topk_pq lesson)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }
}
