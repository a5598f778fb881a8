package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-band (range) joins done the bounded way: a raw range predicate
  * forces Spark into a per-key cartesian (every left row × every right
  * row of the key, filtered late). Instead both sides are BINNED at the
  * band width, the left side probes its two covering bins, and the join
  * is a plain equi-join on (key, bin) with the exact range filter on the
  * (now band-bounded) candidates — expansion factor 2, never quadratic.
  */
object RangeJoin {
  /** Pairs (left, right) with equal `key` and
    * `right.rTime ∈ [left.lTime − deltaSec, left.lTime)` — the
    * "what happened in the Δ before this event" join. Returns
    * `lCols ++ rCols` (right columns renamed `r_`+name on clash). */
  def backwardBand(left: DataFrame, right: DataFrame, key: String,
      lTime: String, rTime: String, deltaSec: Long,
      lCols: Seq[String], rCols: Seq[String]): DataFrame = {
    require(deltaSec >= 1, s"deltaSec must be >= 1 (got $deltaSec)")
    // the exact filter below uses timestamp INTERVAL arithmetic, which
    // does not resolve against numeric epoch columns — reject them up
    // front rather than fail mid-analysis with an opaque error
    Seq(left.schema(lTime), right.schema(rTime)).foreach(f =>
      require(f.dataType == org.apache.spark.sql.types.TimestampType,
        s"time column '${f.name}' must be TimestampType, got ${f.dataType}"))
    val lBin = floor(col(lTime).cast("long") / deltaSec)
    val rBin = floor(col(rTime).cast("long") / deltaSec)
    val l = left.select(
      (col(key).as("__k") +: explode(array(lBin - 1, lBin)).as("__bin") +:
        col(lTime).as("__lt") +: lCols.map(col)): _*)
    val rr = right.select(
      (col(key).as("__rk") +: rBin.as("__bin") +:
        col(rTime).as("__rt") +: rCols.map(c =>
          if (lCols.contains(c)) col(c).as(s"r_$c") else col(c))): _*)
    val rOut = rCols.map(c => if (lCols.contains(c)) s"r_$c" else c)
    l.join(rr, col("__k") === col("__rk") && l("__bin") === rr("__bin"))
      .filter(col("__rt") >= col("__lt") - expr(s"INTERVAL $deltaSec SECOND") &&
        col("__rt") < col("__lt"))
      .select((lCols ++ rOut).map(col): _*)
  }
}
