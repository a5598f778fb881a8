package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Backward as-of join — for every left row, the single right row of the
  * same key with the greatest (time, tieBreak) at or before the left
  * row's time. The event-attribution primitive (click → latest prior
  * view) Spark has no built-in for.
  *
  * Scale shape: tag both sides, union, and carry the last right row
  * forward — never the naive time-range join, whose candidate set is
  * quadratic in events-per-key. The carry runs in TWO passes so one hot
  * key cannot serialize the job: pass 1 windows per (key, coarse
  * time-bucket) — a skewed key's history splits across `numBuckets`
  * parallel tasks; pass 2 windows per key over the ≤numBuckets
  * bucket-end summaries (tiny) and fills rows with no local predecessor.
  * Right rows sort BEFORE left rows at an equal timestamp, making the
  * match inclusive (`right.time <= left.time`); ties among right rows
  * resolve to the greatest `tieBreak`, so the result is total-order
  * deterministic.
  *
  * Null semantics (matches a SQL equi-predicate, unlike a raw window
  * partitionBy which groups NULLs together): null-KEY and null-TIME
  * right rows match nothing; null-key/null-time LEFT rows are kept with
  * a null match. `tieBreak` must be an integral right column; null
  * tieBreak values lose all ties in both directions (they sort at the
  * losing extreme of each variant's tie order).
  */
object AsOfJoin {
  /** Coarse time buckets for the pass-1 window: a hot key's history is
    * split into this many independent tasks. */
  val DefaultBuckets = 64

  /** Returns every left row (all its columns) plus `payloadCols` from
    * the matched right row, renamed `prefix+name` (null when no right
    * row precedes). `tieBreak` must be an integral right column. */
  def asof(left: DataFrame, right: DataFrame, key: String, time: String,
      tieBreak: String, payloadCols: Seq[String],
      prefix: String = "asof_", numBuckets: Int = DefaultBuckets): DataFrame =
    joined(left, right, key, time, tieBreak, payloadCols, prefix,
      forward = false, numBuckets)

  /** Forward variant: the EARLIEST right row at or after the left row's
    * time (ties to the SMALLEST tieBreak) — "the next event after". */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
      time: String, tieBreak: String, payloadCols: Seq[String],
      prefix: String = "asof_", numBuckets: Int = DefaultBuckets): DataFrame =
    joined(left, right, key, time, tieBreak, payloadCols, prefix,
      forward = true, numBuckets)

  /** Scan coordinate for bucketing: the time column as a double (epoch
    * seconds for timestamps). None ⇒ type has no numeric image, fall
    * back to a single bucket (pass 1 degenerates to the per-key window). */
  private def asDouble(t: org.apache.spark.sql.Column, dt: DataType)
      : Option[org.apache.spark.sql.Column] = dt match {
    case _: NumericType => Some(t.cast("double"))
    case _: TimestampType | _: TimestampNTZType => Some(t.cast("double"))
    case _: DateType => Some(t.cast("timestamp").cast("double"))
    case _ => None
  }

  /** One shape, two scan directions: backward scans time ascending and
    * carries the last right row seen (greatest ≤); forward scans time
    * DESCENDING (ties: greatest tieBreak first) so the carried value is
    * the smallest (time, tieBreak) ≥ — right rows sort before left rows
    * at an equal timestamp in both, keeping the bound inclusive. */
  private def joined(left: DataFrame, right: DataFrame, key: String,
      time: String, tieBreak: String, payloadCols: Seq[String],
      prefix: String, forward: Boolean, numBuckets: Int): DataFrame = {
    require(right.schema(tieBreak).dataType match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
      case _ => false
    }, s"tieBreak '$tieBreak' must be an integral column, " +
      s"got ${right.schema(tieBreak).dataType.simpleString}")
    val lCols = left.columns.toSeq
    // a NULL time is not "before everything" (Spark sorts NULLS FIRST)
    // and a NULL key must not meet other NULL keys (window partitionBy
    // groups them, a SQL equi-join doesn't) — such right rows match
    // nothing and are matched by nothing
    val rSel = right.filter(col(time).isNotNull && col(key).isNotNull)
      .select(
        col(key).as("__k"), col(time).as("__t"),
        lit(0).as("__side"),
        // direction-dependent sentinel so a NULL tieBreak loses ties in
        // BOTH variants: backward resolves ties to the greatest tb
        // (null → MinValue+1 loses), forward to the smallest (null →
        // MaxValue loses)
        coalesce(col(tieBreak).cast("long"),
          lit(if (forward) Long.MaxValue else Long.MinValue + 1))
          .as("__tb"),
        struct(payloadCols.map(col): _*).as("__rp"))
    val lrowType = StructType(lCols.map(c => left.schema(c)))
    val rpType = rSel.schema("__rp").dataType
    val lSel = left.select(
      col(key).as("__k"), col(time).as("__t"),
      lit(1).as("__side"),
      lit(if (forward) Long.MaxValue else 0L).as("__tb"),
      lit(null).cast(rpType).as("__rp"),
      struct(lCols.map(col): _*).as("__lrow"))
    // null-time/null-key LEFT rows are the caller's rows: kept, unmatched
    val unmatchedLeft = lSel
      .filter(col("__t").isNull || col("__k").isNull)
      .select(col("__lrow"), col("__rp"))
    val all = rSel
      .withColumn("__lrow", lit(null).cast(lrowType))
      .unionByName(lSel.filter(col("__t").isNotNull && col("__k").isNotNull))
    val order =
      if (forward) Seq(col("__t").desc, col("__side").asc, col("__tb").desc)
      else Seq(col("__t").asc, col("__side").asc, col("__tb").asc)

    // ---- bucket assignment: a monotone image of __t sliced at its
    // QUANTILES, so bucket populations stay balanced even when the time
    // distribution is itself skewed — equal-width ranges would collapse
    // a bursty history into one bucket and resurrect the hot-key
    // serialization this exists to kill. Bucket id = #boundaries ≤ t:
    // monotone in t and equal times share a bucket, so bucket order is
    // consistent with scan order in both directions — ANY monotone
    // bucketing yields the same join output (pinned by AsOfJoinSpec
    // across bucketings), which is what makes estimating the quantiles
    // from a fixed-seed SAMPLE safe: a boundary that drifts with the
    // sample changes task balance, never the answer.
    // NOTE: this boundary pass is an EAGER Spark action at asof() call
    // time (the rest of the operator stays lazy), and the sampled scan
    // re-reads the inputs once before the join itself does — callers
    // whose upstream is expensive to recompute should cache/checkpoint
    // `left`/`right` before calling.
    val bucketed = asDouble(col("__t"), all.schema("__t").dataType) match {
      case Some(td) if numBuckets > 1 =>
        val bounds = bucketBounds(all.select(td.as("__td")), numBuckets)
        if (bounds.isEmpty) all.withColumn("__b", lit(0))
        else all.withColumn("__b",
          bounds.map(b => when(td >= lit(b), 1).otherwise(0))
            .reduce(_ + _))
      case _ => all.withColumn("__b", lit(0))
    }

    // ---- pass 1: carry within each (key, bucket) — the skew-splitting
    // window; a hot key's events spread over numBuckets parallel tasks
    val w1 = Window.partitionBy("__k", "__b").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed
      .withColumn("__mloc", last(col("__rp"), ignoreNulls = true).over(w1))

    // ---- pass 2: per key over bucket-END summaries (≤numBuckets rows
    // per key, however hot). The carry leaving a bucket is its LAST
    // right row's payload in scan order — max_by over right rows only
    // (left rows get a null ordering, which max_by skips), ONE
    // partial-aggregatable hash aggregate instead of recomputing the
    // pass-1 window in a second branch. The incoming carry for bucket b
    // = last non-null summary of any earlier-scanned bucket.
    // ordering key = the EXACT (__t, __tb) pair (struct ordering works
    // for any orderable time type — no lossy double cast: dates/strings
    // survive, and >2^53 integral timestamps keep full precision);
    // forward's "last in desc scan order" is simply the minimum
    val rightPos = when(col("__side") === 0, struct(col("__t"), col("__tb")))
    val bucketEnd = bucketed.groupBy("__k", "__b")
      .agg((if (forward) min_by(col("__rp"), rightPos)
            else max_by(col("__rp"), rightPos)).as("__bl"))
    val wb = Window.partitionBy("__k")
      .orderBy(if (forward) col("__b").desc else col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val incoming = bucketEnd
      .withColumn("__in", last(col("__bl"), ignoreNulls = true).over(wb))
      .select(col("__k"), col("__b"), col("__in"))

    // ---- stitch: local carry if the bucket had a predecessor, else the
    // carry entering the bucket
    local
      .join(incoming, Seq("__k", "__b"), "left")
      .filter(col("__side") === 1)
      .select(col("__lrow"), coalesce(col("__mloc"), col("__in")).as("__rp"))
      .unionByName(unmatchedLeft)
      .select(lCols.map(c => col(s"__lrow.$c").as(c)) ++
        payloadCols.map(c => col(s"__rp.$c").as(prefix + c)): _*)
  }

  /** Quantile boundaries for the pass-1 bucketing, estimated from a
    * fixed-seed 5% sample. A small input can leave the sample empty (or
    * one row → a single boundary), collapsing to one bucket and quietly
    * reinstating the hot-key serialization the bucketing exists to kill:
    * fewer than two sampled boundaries falls back to the unsampled scan
    * — cheap exactly when the sample was starved. `private[graft]` so
    * AsOfPropSpec can pin bucket count > 1 at tiny scale. */
  private[graft] def bucketBounds(ts: DataFrame, numBuckets: Int)
      : Seq[Double] = {
    val probs = (1 until numBuckets).map(_.toDouble / numBuckets).toArray
    val sampled = ts
      .sample(withReplacement = false, fraction = 0.05, seed = 42L)
      .stat.approxQuantile("__td", probs, 0.01)
      .distinct.sorted.toSeq
    if (sampled.size >= 2) sampled
    else ts.stat.approxQuantile("__td", probs, 0.01).distinct.sorted.toSeq
  }
}
