package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables

/** Sketch-based corpus statistics — the 100 TB path for frequency and
  * cardinality questions where an exact groupBy's shuffle would carry
  * the full key space. Each sketch is a constant-size, mergeable
  * partial aggregate (map-side combined, one tiny row to the driver):
  *
  *  - Count-Min over tokens (Cormode–Muthukrishnan): point-frequency
  *    estimates with one-sided error ≤ ε·N at confidence δ.
  *  - HyperLogLog++ for distinct-token cardinality (relative-error
  *    bounded).
  *  - t-digest-style approximate quantiles (Spark `percentile_approx`)
  *    over per-doc token counts.
  *
  * The catalog row is self-verifying the same way the trained-ANN rows
  * are: the sketch estimates are checked IN-ENGINE against the exact
  * answers computed on the same (small) verification corpus, and the
  * query emits booleans the DuckDB oracle pins to TRUE — an estimator
  * regression turns the row red rather than passing rows>0.
  */
object SketchQueries {
  /** CMS accuracy: overestimate bound ε (of total token mass N). */
  private val Eps = 0.001
  private val Conf = 0.99
  private val Seed = 42
  /** HLL relative standard deviation requested / gate multiple. */
  private val HllRsd = 0.02
  private val HllGate = 0.05

  val qs: Seq[Q] = Seq(
    Q(
      "sketch_token_stats",
      (s, dir) => {
        import graft.text.TextAnalysis.wordTokens
        val toks = Tables.documents(s, dir)
          .selectExpr(s"explode(${wordTokens("text")}) as w")
        // exact side: total mass, distinct count, top-20 frequencies
        // (bounded collects: 1 row + 20 rows)
        val exactRow = toks
          .agg(count(lit(1)).as("n"), countDistinct("w").as("d")).head()
        val (n, d) = (exactRow.getLong(0), exactRow.getLong(1))
        val top = toks.groupBy("w").agg(count(lit(1)).as("c"))
          .orderBy(desc("c"), col("w")).limit(20).collect()
          .map(r => (r.getString(0), r.getLong(1)))
        // sketch side: one row of mergeable binary/approx aggregates
        val skRow = toks.agg(
          expr(s"count_min_sketch(w, ${Eps}d, ${Conf}d, $Seed)").as("cms"),
          approx_count_distinct(col("w"), HllRsd).as("ad")).head()
        val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(skRow.getAs[Array[Byte]]("cms")))
        val slack = math.ceil(Eps * n).toLong
        val hhOk = top.forall { case (w, c) =>
          val est = cms.estimateCount(w)
          est >= c && est <= c + slack
        }
        val dOk = math.abs(skRow.getLong(1) - d).toDouble / d <= HllGate
        val spark = s
        import spark.implicits._
        Seq((hhOk, dOk)).toDF("hh_ok", "distinct_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS hh_ok, CAST(1 AS BOOLEAN) AS distinct_ok")
    ),
    Q(
      "sketch_token_quantiles",
      (s, dir) => {
        import graft.text.TextAnalysis.wordTokens
        val nt = Tables.documents(s, dir)
          .selectExpr(s"size(${wordTokens("text")}) as nt")
        // approximate quantiles with accuracy high enough that the
        // estimate must land within the exact p25..p75 band (the gate
        // below); exact percentiles computed on the same column
        val row = nt.agg(
          expr("percentile_approx(nt, array(0.5, 0.9), 10000)").as("ap"),
          expr("percentile(nt, array(0.25, 0.5, 0.75, 0.9, 0.99))").as("ex"))
          .head()
        val ap = row.getSeq[Int](0)
        val ex = row.getSeq[Double](1)
        val medOk = ap(0) >= ex(0) && ap(0) <= ex(2)
        val p90Ok = ap(1) >= ex(1) && ap(1) <= ex(4)
        val spark = s
        import spark.implicits._
        Seq((medOk, p90Ok)).toDF("median_ok", "p90_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS median_ok, CAST(1 AS BOOLEAN) AS p90_ok")
    )
  )
}
