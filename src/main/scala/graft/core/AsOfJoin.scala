package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the single right row of the
  * same key with the greatest (time, tieBreak) at or before the left
  * row's time. The event-attribution primitive (click → latest prior
  * view) Spark has no built-in for.
  *
  * Scale shape: tag both sides, union, ONE shuffle on the key, and a
  * single carry-forward window (`last(…, ignoreNulls)` over rows
  * unbounded-preceding..current) — never the naive time-range join,
  * whose candidate set is quadratic in events-per-key. Right rows sort
  * BEFORE left rows at an equal timestamp, making the match inclusive
  * (`right.time <= left.time`); ties among right rows resolve to the
  * greatest `tieBreak`, so the result is total-order deterministic.
  */
object AsOfJoin {
  /** Returns every left row (all its columns) plus `payloadCols` from
    * the matched right row, renamed `prefix+name` (null when no right
    * row precedes). `tieBreak` must be an integral right column. */
  def asof(left: DataFrame, right: DataFrame, key: String, time: String,
      tieBreak: String, payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame =
    joined(left, right, key, time, tieBreak, payloadCols, prefix,
      forward = false)

  /** Forward variant: the EARLIEST right row at or after the left row's
    * time (ties to the SMALLEST tieBreak) — "the next event after". */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
      time: String, tieBreak: String, payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame =
    joined(left, right, key, time, tieBreak, payloadCols, prefix,
      forward = true)

  /** One shape, two scan directions: backward scans time ascending and
    * carries the last right row seen (greatest ≤); forward scans time
    * DESCENDING (ties: greatest tieBreak first) so the carried value is
    * the smallest (time, tieBreak) ≥ — right rows sort before left rows
    * at an equal timestamp in both, keeping the bound inclusive. */
  private def joined(left: DataFrame, right: DataFrame, key: String,
      time: String, tieBreak: String, payloadCols: Seq[String],
      prefix: String, forward: Boolean): DataFrame = {
    val lCols = left.columns.toSeq
    // a NULL time is not "before everything": Spark sorts NULLS FIRST,
    // so an unfiltered null-time right row would be carried into every
    // left row that has no real predecessor (and the SQL oracles, which
    // default to NULLS LAST, would disagree) — null-time rows match
    // nothing and are matched by nothing
    val rSel = right.filter(col(time).isNotNull).select(
      col(key).as("__k"), col(time).as("__t"),
      lit(0).as("__side"), col(tieBreak).cast("long").as("__tb"),
      struct(payloadCols.map(col): _*).as("__rp"))
    val lrowType = org.apache.spark.sql.types.StructType(
      lCols.map(c => left.schema(c)))
    val rpType = rSel.schema("__rp").dataType
    val lSel = left.select(
      col(key).as("__k"), col(time).as("__t"),
      lit(1).as("__side"),
      lit(if (forward) Long.MaxValue else 0L).as("__tb"),
      lit(null).cast(rpType).as("__rp"),
      struct(lCols.map(col): _*).as("__lrow"))
    val nullTimeLeft = lSel.filter(col("__t").isNull)
      .select((Seq(col("__lrow")) :+ col("__rp")): _*)
    val all = rSel
      .withColumn("__lrow", lit(null).cast(lrowType))
      .unionByName(lSel.filter(col("__t").isNotNull))
    val order =
      if (forward) Seq(col("__t").desc, col("__side").asc, col("__tb").desc)
      else Seq(col("__t").asc, col("__side").asc, col("__tb").asc)
    val w = Window.partitionBy("__k")
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lrow"), col("__m").as("__rp"))
      // null-time LEFT rows are kept (they are the caller's rows) with a
      // null match, never a carried one
      .unionByName(nullTimeLeft)
      .select(lCols.map(c => col(s"__lrow.$c").as(c)) ++
        payloadCols.map(c => col(s"__rp.$c").as(prefix + c)): _*)
  }
}
