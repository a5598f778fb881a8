package graft.queries

import graft.Q
import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.knn.Ann

/** ANN catalog queries: LSH (oracled end-to-end) and IVF (k-means; recall
  * gated in AnnSpec, rows-only check here).
  */
object AnnQueries {
  private val D = Tables.EmbeddingDim
  private val K = 10

  val qs: Seq[Q] = Seq(
    Q(
      "ann_lsh_search",
      (s, dir) =>
        Ann.lshSearch(Tables.embeddings(s, dir), "embedding", "vec_id",
          hashVectorValues(11L, D), D, K),
      Some(Ann.lshSearchSql("embeddings", "embedding", "vec_id",
        hashVectorSql("11", D), D, K)),
      bench = true
    ),
    Q(
      "ann_ivf_search",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val model = Ann.trainIvf(emb, "embedding", cells = 16)
        Ann.ivfSearch(emb, "embedding", "vec_id", model,
          hashVectorValues(11L, D), nprobe = 4, K)
      },
      None // k-means cells not SQL-reproducible; recall gate in AnnSpec
    )
  )
}
