package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.text.TextAnalysis

/** Embedding provider surface — the reference's `Embedder` trait +
  * `MockEmbedder` + `CachedEmbedder` (jcolano/fastpyvectordb
  * `embeddings.py:49-88, 343-448`). Remote providers (OpenAI/Cohere/...)
  * are out of engine scope (network egress); the deterministic hash
  * embedder is the test-time provider, exactly like the reference's
  * MockEmbedder is for its pytest suite (`tests/test_client.py:33-36`).
  */
trait Embedder {
  def dimensions: Int
  def modelName: String
  /** Column-level batch embedding (a whole DataFrame column at once —
    * the engine-native analog of `embed_batch`). Takes the text column as
    * a SQL expression string because the key hash composes SQL fragments.
    */
  def embed(textExpr: String): Column
}

/** Deterministic text embedder: key = rolling char hash of the text
  * (mod 2^31−1), vector = LCG hash-vector of the key. The reference
  * seeds numpy's RNG from sha256(text) (`embeddings.py:361-371`); graft
  * uses pure integer arithmetic instead so a DuckDB oracle reproduces
  * every vector bit-for-bit.
  */
final case class HashEmbedder(dimensions: Int) extends Embedder {
  val modelName = "graft-hash"

  /** NOTE: inlines the key hash into all `dimensions` vector lambdas —
    * fine for small batches (cache misses); for corpus-scale embedding
    * materialize the key first: `.withColumn("key", e.textKey("text"))
    * .withColumn("v", e.embedKey(col("key")))`. */
  def embed(textExpr: String): Column =
    VectorFunctions.hashVector(textKey(textExpr), dimensions)

  /** Vector from an already-materialized key column (evaluates the text
    * hash once per row instead of once per vector element). */
  def embedKey(key: Column): Column =
    VectorFunctions.hashVector(key, dimensions)

  /** The text→key hash as a Column — the one-pass codegen kernel
    * ([[graft.expr.CharHash]]; the SQL-expression fold re-sliced the
    * string per character, O(n²) per doc on the interpreted
    * higher-order path — embed_cached at sf0.1 measured 7.6 s warm on
    * it, 3 keyings per run). Value-identical to
    * [[TextAnalysis.charHash]] and the DuckDB twin. */
  def textKey(textExpr: String): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.expr.CharHash(
        org.apache.spark.sql.graft.bridge.expression(expr(textExpr))))

  /** Driver-side embedding of one string (same arithmetic). */
  def embedValue(text: String): Seq[Double] =
    VectorFunctions.hashVectorValues(keyValue(text), dimensions)

  /** Folds Unicode CODE POINTS, not UTF-16 code units, so it agrees with
    * the [[graft.expr.CharHash]] kernel (and the DuckDB `ascii(substr)`
    * twin) on supplementary-plane text — a surrogate-pair fold would
    * diverge from the engine for any astral character (ADVICE r9). */
  def keyValue(text: String): Long = {
    var acc = 0L
    val it = text.codePoints().iterator()
    while (it.hasNext)
      acc = (acc * TextAnalysis.CharB + it.nextInt()) % TextAnalysis.HashM
    acc
  }

  /** DuckDB twins. */
  def embedSql(textExpr: String): String =
    VectorFunctions.hashVectorSql(TextAnalysis.charHashSql(textExpr), dimensions)
}

/** Cache-through embedding: reuse vectors for already-embedded texts,
  * embed only the misses, return the union (reference `CachedEmbedder`,
  * `embeddings.py:374-448` — sha256-keyed disk cache → here a cache
  * *table* joined by text key, the batch-native form).
  */
object CachedEmbedder {
  /** @param docs  (id, text)
    * @param cache (key, vector) — previously embedded
    * @return (id, text, vector, from_cache)
    */
  def embedWithCache(docs: DataFrame, cache: DataFrame, e: HashEmbedder): DataFrame = {
    val keyed = docs.withColumn("key", e.textKey("text"))
    val hits = keyed.join(cache, "key")
      .select(col("id"), col("text"), col("vector"), lit(true).as("from_cache"))
    val misses = keyed.join(cache.select("key"), Seq("key"), "left_anti")
      .select(col("id"), col("text"),
        e.embed("text").as("vector"), lit(false).as("from_cache"))
    hits.unionByName(misses)
  }
}

/** Provider factory — the reference's `get_embedder`
  * (`embeddings.py:455-514`): resolves a provider name to an Embedder.
  * Remote providers (openai/cohere/sentence-transformers) are declared
  * but out of engine scope (no network egress): requesting one raises,
  * exactly like the reference does without the client library/API key;
  * "auto" therefore resolves to the deterministic hash embedder (the
  * reference's auto-fallback to MockEmbedder when nothing is installed).
  */
object Embedders {
  val RemoteProviders = Set("openai", "cohere", "sentence-transformers")

  def get(provider: String = "auto", dimensions: Int = 64): Embedder =
    provider match {
      case "auto" | "mock" | "hash" => HashEmbedder(dimensions)
      case p if RemoteProviders(p) =>
        throw new UnsupportedOperationException(
          s"provider '$p' requires network egress — out of engine scope " +
            "(SURVEY §2.9); use the deterministic 'hash' provider")
      case p => throw new IllegalArgumentException(s"unknown provider: $p")
    }
}
