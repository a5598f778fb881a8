package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{BucketedLayout, LayoutPublish, PartitionedLayout}

/** Cross-JVM publish protocol for the storage layouts (VERDICT r8 #1):
  * builds land in a tmp dir, the ready marker rides INSIDE it, and an
  * atomic no-overwrite rename publishes — so concurrent `ensure()`s can
  * race without one deleting files the other has registered and is
  * mid-scan on, and a reader never sees a partial dir. Stale
  * generations survive until provably cold (grace period).
  *
  * The in-JVM race below drives [[LayoutPublish.publish]] directly (the
  * layouts' `ensure()` wrappers serialize in-JVM callers with
  * `synchronized`, so the publish layer is where two JVMs actually
  * meet — same code path, same filesystem primitives).
  */
class LayoutPublishSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def scratch(): Path = new Path(
    java.nio.file.Files.createTempDirectory("graft_layout_spec").toString)

  test("concurrent publishers: exactly one wins, no lost table, loser's tmp cleaned") {
    val root = scratch()
    val dst = new Path(root, "gen_abc")
    val fs = LayoutPublish.fs(spark, dst)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    // each builder writes a one-file payload tagged with its own id;
    // the barrier maximizes overlap so rename-time contention is real
    val futures = (1 to 2).map { who =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = {
          start.await(10, TimeUnit.SECONDS)
          LayoutPublish.publish(spark, dst) { tmp =>
            fs.mkdirs(tmp)
            val out = fs.create(new Path(tmp, s"payload"), true)
            out.write(s"builder-$who".getBytes); out.close()
          }
        }
      })
    }
    start.countDown()
    val wins = futures.map(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    assert(wins.count(identity) <= 1, "at most one publisher reports a win")
    assert(LayoutPublish.ready(spark, dst), "dst published and marked ready")
    // exactly one coherent payload — the loser's rename must NOT have
    // nested its tmp inside the winner's dir (RawLocalFileSystem rename
    // semantics without the no-overwrite guard)
    val entries = fs.listStatus(dst).map(_.getPath.getName).sorted
    assert(entries.toSeq == Seq(LayoutPublish.ReadyMarker, "payload"),
      s"published dir holds exactly marker+payload, got ${entries.toSeq}")
    // no leftover tmp siblings
    val leftovers = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith(".tmp_"))
    assert(leftovers.isEmpty, s"loser tmp dirs cleaned: ${leftovers.toSeq}")
    fs.delete(root, true)
  }

  test("publish is idempotent once ready — second call never rebuilds") {
    val root = scratch()
    val dst = new Path(root, "gen_x")
    val fs = LayoutPublish.fs(spark, dst)
    var builds = 0
    LayoutPublish.publish(spark, dst) { tmp =>
      builds += 1; fs.mkdirs(tmp)
    }
    LayoutPublish.publish(spark, dst) { tmp =>
      builds += 1; fs.mkdirs(tmp)
    }
    assert(builds == 1, "ready dst short-circuits the build")
    fs.delete(root, true)
  }

  test("stale sibling generations survive within the grace period, go after it") {
    val root = scratch()
    val fs = LayoutPublish.fs(spark, root)
    val live = new Path(root, "events_new")
    val stale = new Path(root, "events_old")
    val tmpLeft = new Path(root, ".tmp_events_crashed")
    Seq(live, stale, tmpLeft).foreach { p =>
      fs.mkdirs(p)
      fs.create(new Path(p, LayoutPublish.ReadyMarker), true).close()
    }
    // default grace (1 h): a just-written sibling is NOT provably stale —
    // another live session may have it registered mid-scan
    LayoutPublish.gcStale(spark, root, "events_", "events_new")()
    assert(fs.exists(stale), "fresh sibling survives default grace")
    assert(fs.exists(tmpLeft), "fresh tmp leftover survives default grace")
    // grace 0 (test hook): both are provably cold and collected
    val deleted = scala.collection.mutable.Buffer[String]()
    sys.props("graft.layout.gc.grace.ms") = "0"
    try {
      Thread.sleep(5)
      LayoutPublish.gcStale(spark, root, "events_", "events_new")(deleted += _)
    } finally sys.props.remove("graft.layout.gc.grace.ms")
    assert(!fs.exists(stale) && !fs.exists(tmpLeft))
    assert(fs.exists(live), "the kept generation is never collected")
    assert(deleted.contains("events_old"))
    fs.delete(root, true)
  }

  test("layout ensure()s from two sessions agree and their gates still hold") {
    // two catalog-sharing sessions (the in-JVM analogue of builder +
    // driver): both ensure, both query, the published generation serves
    // both and the throwing plan gates (no exchange / partition pruning)
    // stay green through the new publish path
    val s2 = spark.newSession()
    val (ot1, lt1) = BucketedLayout.ensure(spark, sf)
    val (ot2, lt2) = BucketedLayout.ensure(s2, sf)
    assert((ot1, lt1) == (ot2, lt2), "fingerprint-keyed names agree")
    val n1 = BucketedLayout.customerQuantities(spark, sf).count()
    val n2 = BucketedLayout.customerQuantities(s2, sf).count()
    assert(n1 == n2 && n1 > 0)
    val p1 = PartitionedLayout.ensure(spark, sf)
    val p2 = PartitionedLayout.ensure(s2, sf)
    assert(p1 == p2)
    assert(PartitionedLayout.clickRollup(s2, sf).count() > 0)
  }
}
