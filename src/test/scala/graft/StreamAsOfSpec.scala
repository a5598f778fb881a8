package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.core.AsOfJoin
import graft.stream.StreamAsOf

/** Streaming as-of enrichment vs the batch as-of join: the streamed
  * result over multiple micro-batches must equal the batch operator on
  * the union — including when arrival order is SHUFFLED across batches,
  * the case the watermark-buffered design exists for. A final high-time
  * sentinel right row (unused key) pushes the watermark past every real
  * event so all buffered lefts flush. */
class StreamAsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val cols = Seq("k", "t", "side", "eid", "v")
  private val SentinelKey = 999L

  /** Stream `batches` through enrich(lateness), sentinel-flush, and
    * return eid -> asof_v. */
  private def streamed(batches: Seq[Seq[(Long, Long, Int, Long, Double)]],
      lateness: String): Map[Long, Option[Double]] = {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_stream_asof").toString
    batches.head.toDF(cols: _*).coalesce(1).write.parquet(s"$src/d0")
    val stream = spark.readStream
      .schema(batches.head.toDF(cols: _*).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/d*")
    val name = s"asof_sink_${System.nanoTime()}"
    val q = StreamAsOf.enrich(stream, lateness)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      batches.tail.zipWithIndex.foreach { case (b, i) =>
        b.toDF(cols: _*).coalesce(1).write.parquet(s"$src/d${i + 1}")
        q.processAllAvailable()
      }
      // sentinel: one right row far in the future on an unused key
      Seq((SentinelKey, 100000L, 0, 999999L, 0.0))
        .toDF(cols: _*).coalesce(1).write.parquet(s"$src/dz")
      q.processAllAvailable()
      spark.table(name).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .toMap
    } finally q.stop()
  }

  /** Batch AsOfJoin reference over the union. */
  private def batchRef(all: Seq[(Long, Long, Int, Long, Double)])
      : Map[Long, Option[Double]] = {
    import spark.implicits._
    val left = all.filter(_._3 == 1).map(e => (e._4, e._1, e._2))
      .toDF("eid", "k", "t")
    val right = all.filter(_._3 == 0).map(e => (e._4, e._1, e._2, e._5))
      .toDF("eid", "k", "t", "v")
    AsOfJoin.asof(left, right, "k", "t", tieBreak = "eid",
        payloadCols = Seq("v"))
      .collect()
      .map(r => r.getLong(r.fieldIndex("eid")) ->
        (if (r.isNullAt(r.fieldIndex("asof_v"))) None
         else Some(r.getDouble(r.fieldIndex("asof_v")))))
      .toMap
  }

  // times start at 1: the engine's inclusive late filter drops rows at
  // or below the watermark, and the INITIAL watermark is 0 — a t=0 row
  // can never be admitted to an event-time-timeout stateful op
  private def mk(rnd: scala.util.Random, lo: Int, n: Int, eidBase: Int) =
    (0 until n).map { i =>
      (rnd.nextInt(3).toLong + 1L, (1 + lo + rnd.nextInt(100)).toLong,
        if (rnd.nextBoolean()) 0 else 1, (eidBase + i).toLong,
        rnd.nextInt(1000).toDouble)
    }

  test("multi-batch streamed enrichment equals the batch as-of join") {
    val rnd = new scala.util.Random(13)
    val b1 = mk(rnd, 0, 60, 0)
    val b2 = mk(rnd, 100, 60, 1000)
    val got = streamed(Seq(b1, b2), lateness = "0 seconds")
    val want = batchRef(b1 ++ b2)
    assert(got == want && got.nonEmpty)
    assert(got.values.exists(_.isDefined)) // matches actually happen
  }

  test("SHUFFLED arrival across batches still equals the batch as-of join") {
    val rnd = new scala.util.Random(29)
    // events over [0, 200) delivered in three batches in RANDOM order —
    // a right row routinely arrives after left events it must enrich;
    // lateness covers the full disorder so nothing is watermark-dropped
    val all = rnd.shuffle(mk(rnd, 0, 150, 0) ++ mk(rnd, 100, 30, 5000))
    val batches = all.grouped(60).toSeq
    val got = streamed(batches, lateness = "300 seconds")
    val want = batchRef(all)
    assert(got == want && got.nonEmpty)
    assert(got.values.exists(_.isDefined))
  }

  test("a right row later than the lateness bound is dropped, not mis-applied") {
    // in-order history, then one right row 100 s behind the watermark:
    // with lateness 0 it must NOT enrich later lefts (the old
    // arrival-order design would have installed it as the carry)
    val hist = Seq(
      (1L, 10L, 0, 1L, 5.0),   // right t=10 v=5
      (1L, 150L, 0, 2L, 7.0))  // right t=150 v=7 — pushes wm to 150
    val late = Seq(
      (1L, 50L, 0, 3L, 99.0),  // LATE right (t=50 < wm) — must be dropped
      (1L, 160L, 1, 100L, 0.0)) // left t=160 → matches v=7, never 99
    val got = streamed(Seq(hist, late), lateness = "0 seconds")
    assert(got(100L) == Some(7.0))
  }

  test("nonzero lateness admits late-but-in-bound rights (VERDICT r6 #7)") {
    // lateness 10 s: after batch 1 the watermark sits at 100−10 = 90,
    // so batch 2's right at t=93 is LATE (behind the max event time
    // already seen) but ADMISSIBLE (above the watermark) — the buffered
    // design must install it and enrich the pending left at t=95 with
    // it (rt=93 ≤ 95 beats rt=100 which is in the left's future); a
    // design that compacted rights at max-event-time instead of the
    // watermark would have folded t=93 away or matched t=100
    val b1 = Seq(
      (1L, 100L, 0, 1L, 1.0)) // right t=100 v=1 → wm 90
    val b2 = Seq(
      (1L, 95L, 1, 10L, 0.0), // left t=95 — pending (95 > wm 90)
      (1L, 93L, 0, 2L, 2.0))  // late-but-admissible right t=93 v=2
    val got = streamed(Seq(b1, b2), lateness = "10 seconds")
    assert(got(10L) == Some(2.0))
    // and the full result still equals the batch as-of join
    assert(got == batchRef(b1 ++ b2))
  }

  test("a key that goes quiet mid-stream compacts rights to the one-row carry (VERDICT r7 #3)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.stream.StreamAsOf
    import graft.stream.StreamAsOf.{Buf, Carry, EvT}
    def ev(t: Long, eid: Long, v: Double) =
      EvT(1L, t, 0, eid, v, new java.sql.Timestamp(t * 1000L))
    // batch 1 (watermark 5 s): two admissible rights, no lefts — then
    // the key goes QUIET. The step must still register an event-time
    // timeout so a later watermark advance can compact the buffer
    // without waiting for new traffic on this key.
    val s1 = TestGroupState.create[Buf](Optional.empty[Buf](),
      GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(5000L), false)
    val out1 = StreamAsOf.step(1L,
      Iterator(ev(10L, 1L, 5.0), ev(20L, 2L, 7.0)), s1).toSeq
    assert(out1.isEmpty)
    assert(s1.get.rights.size == 2 && s1.get.carry.isEmpty)
    assert(s1.getTimeoutTimestampMs.isPresent,
      "dormant key must arm a wake-up timeout")
    // the timeout fires at watermark 25 s with NO rows for the key: the
    // full rights buffer must fold into the single winning carry row —
    // the documented per-key state bound for dormant keys
    val s2 = TestGroupState.create[Buf](Optional.of(s1.get),
      GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(25000L), true)
    val out2 = StreamAsOf.step(1L, Iterator.empty, s2).toSeq
    assert(out2.isEmpty)
    assert(s2.get.rights.isEmpty && s2.get.lefts.isEmpty,
      s"state not compacted: ${s2.get}")
    assert(s2.get.carry == Some(Carry(20L, 2L, 7.0)))
    // compacted and no pending work: no further timeout is armed
    assert(!s2.getTimeoutTimestampMs.isPresent)
    // and a left arriving AFTER the quiet stretch buffers above the
    // watermark, then flushes from the carry once the watermark clears it
    val s3 = TestGroupState.create[Buf](Optional.of(s2.get),
      GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(25000L), false)
    assert(StreamAsOf.step(1L,
      Iterator(EvT(1L, 30L, 1, 100L, 0.0,
        new java.sql.Timestamp(30000L))), s3).toSeq.isEmpty)
    assert(s3.get.lefts.size == 1)
    val s4 = TestGroupState.create[Buf](Optional.of(s3.get),
      GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(40000L), true)
    val out4 = StreamAsOf.step(1L, Iterator.empty, s4).toSeq
    assert(out4 == Seq(StreamAsOf.Enriched(100L, 1L, 30L, Some(7.0))))
  }
}
