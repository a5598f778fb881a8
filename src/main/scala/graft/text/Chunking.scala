package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding token-window chunking — the doc→embedding-unit splitter of an
  * embedding/RAG ingest pipeline (the reference's EmbeddingCollection
  * embeds whole documents, `embeddings.py:521-609`; real corpora split
  * them first). `window`-token chunks at `stride` (overlap = window −
  * stride), final partial window kept, docs with no tokens dropped.
  *
  * Scale: one tokenize pass and one explode of per-doc start offsets —
  * linear in token volume, no shuffle; chunk rows inherit the input
  * partitioning, so a downstream embed/insert stage runs fully parallel.
  */
object Chunking {
  /** (idCol, passthrough…, chunk_idx, n_tokens, chunk_text) — one row per
    * window. `chunk_text` is the tokens re-joined with single spaces
    * (tokenization is lossy by design: chunks feed embedding, not
    * reconstruction). */
  def chunk(docs: DataFrame, textCol: String, idCol: String,
      window: Int, stride: Int, passthrough: Seq[String] = Nil): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window (got window=$window, stride=$stride)")
    import TextAnalysis.wordTokens
    val keep = (idCol +: passthrough).map(col)
    docs
      .select(keep :+ expr(s"${wordTokens(textCol)}").as("toks"): _*)
      .filter(size(col("toks")) > 0)
      .select(keep ++ Seq(col("toks"),
        posexplode(expr(s"sequence(0, size(toks) - 1, $stride)"))): _*)
      .withColumnRenamed("pos", "chunk_idx")
      .select(keep ++ Seq(col("chunk_idx"),
        expr(s"slice(toks, col + 1, $window)").as("ctoks")): _*)
      .select(keep ++ Seq(col("chunk_idx"),
        size(col("ctoks")).as("n_tokens"),
        expr("array_join(ctoks, ' ')").as("chunk_text")): _*)
  }
}
