package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark pipeline over a testdata scale
  * directory plus (when SQL-expressible) an equivalent DuckDB oracle.
  * Column names/types and row ordering determinism must match between the
  * two (driver hashes values after sorting columns by name).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Catalog {
  def all: Seq[Q] =
    queries.KnnQueries.qs ++
      queries.AggQueries.qs ++
      queries.FilterQueries.qs ++
      queries.TextQueries.qs ++
      queries.DedupQueries.qs ++
      queries.Bm25Queries.qs ++
      queries.QuantQueries.qs ++
      queries.GraphQueries.qs ++
      queries.GraphVectorQueries.qs ++
      queries.StreamQueries.qs ++
      queries.CrudQueries.qs ++
      queries.AnnQueries.qs ++
      queries.EmbedQueries.qs ++
      queries.MediaQueries.qs ++
      queries.PipelineQueries.qs ++
      queries.SketchQueries.qs ++
      queries.CollectionQueries.qs

  lazy val byName: Map[String, Q] =
    all.map(q => q.name -> q).toMap.withDefault { n =>
      throw new NoSuchElementException(
        s"unknown query '$n'; available: ${all.map(_.name).sorted.mkString(", ")}")
    }
}
