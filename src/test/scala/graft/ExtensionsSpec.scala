package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The library loads through spark.sql.extensions and its kernels are
  * callable from plain SQL.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers the vector kernels for SQL") {
    // getOrCreate() reuses any active session and would skip extensions —
    // clear the active/default slots so a fresh session (sharing the
    // JVM-wide SparkContext) is built with the extensions applied.
    val prev = SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s.sql(
        """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |       round(vec_cosine_distance(array(1.0D, 0.0D), array(0.0D, 1.0D)), 6) AS c,
          |       vec_l2_distance(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS l,
          |       vec_ip_distance(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS ip
          |""".stripMargin).head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getDouble(1) == 1.0)
      assert(r.getDouble(2) == 5.0)
      assert(r.getDouble(3) == -11.0)
      // fp16 codec round-trips from SQL (0.5 is exactly representable)
      val h = s.sql(
        "SELECT fp16_decode(fp16_encode(array(0.5D, -2.0D))) AS v").head()
      assert(h.getSeq[Float](0) == Seq(0.5f, -2.0f))
      // SQL top-k over a vector column plans TakeOrderedAndProject
      import s.implicits._
      Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
        .toDF("id", "v").createOrReplaceTempView("vt")
      val top = s.sql(
        """SELECT id FROM vt
          |ORDER BY vec_cosine_distance(v, array(1.0D, 0.0D)) LIMIT 1""".stripMargin)
      assert(top.head().getLong(0) == 1L)
      assert(top.queryExecution.executedPlan.toString
        .contains("TakeOrderedAndProject"))
      // the injected AnnTopKRewrite serves SQL top-k-by-distance from the
      // LSH index once the table is registered (plain SQL text end-to-end)
      val sf = SparkTestSession.sf
      val D = graft.core.Tables.EmbeddingDim
      graft.plans.IndexedTables.register(s, s"$sf/embeddings.parquet",
        "embedding", "vec_id", D, graft.index.Indexes.lshEmb(s, sf))
      try {
        s.read.parquet(s"$sf/embeddings.parquet").createOrReplaceTempView("emb")
        val arr = graft.functions.VectorFunctions.hashVectorValues(11L, D)
          .map(v => s"${v}D").mkString("array(", ", ", ")")
        val sqlTop = s.sql(
          s"""SELECT vec_id FROM emb
             |ORDER BY vec_cosine_distance(embedding, $arr) LIMIT 5""".stripMargin)
        assert(sqlTop.queryExecution.executedPlan.toString.contains("band_idx"),
          sqlTop.queryExecution.executedPlan.toString)
        val ids = sqlTop.collect().map(_.getLong(0)).toSeq
        val expect = graft.index.LshIndex.search(s,
            graft.index.Indexes.lshEmb(s, sf), "embedding", "vec_id",
            graft.functions.VectorFunctions.hashVectorValues(11L, D), D, 5)
          .collect().map(_.getLong(0)).toSeq
        assert(ids == expect)
      } finally graft.plans.IndexedTables.clear()
      // …and the l2/ip faces, from plain SQL text, once registered with
      // their IVF / MIPS index
      val arr = graft.functions.VectorFunctions.hashVectorValues(11L, D)
        .map(v => s"${v}D").mkString("array(", ", ", ")")
      graft.plans.IndexedTables.registerIvf(s, s"$sf/embeddings.parquet",
        "embedding", "vec_id", D, graft.index.Indexes.ivfEmb(s, sf),
        graft.knn.Ann.fixedIvfModel(graft.index.Indexes.IvfCells, D))
      try {
        val l2Top = s.sql(
          s"""SELECT vec_id FROM emb
             |ORDER BY vec_l2_distance(embedding, $arr) LIMIT 5""".stripMargin)
        assert(l2Top.queryExecution.executedPlan.toString
          .contains("PartitionFilters: [cell"))
        assert(l2Top.collect().length == 5)
      } finally graft.plans.IndexedTables.clear()
      graft.plans.IndexedTables.registerMips(s, s"$sf/embeddings.parquet",
        "embedding", "vec_id", D, graft.index.Indexes.mipsEmb(s, sf),
        cells = graft.index.Indexes.IvfCells)
      try {
        val ipTop = s.sql(
          s"""SELECT vec_id FROM emb
             |ORDER BY vec_ip_distance(embedding, $arr) LIMIT 5""".stripMargin)
        assert(ipTop.queryExecution.executedPlan.toString
          .contains("PartitionFilters: [cell"))
        assert(ipTop.collect().length == 5)
      } finally graft.plans.IndexedTables.clear()
    } finally {
      // do not stop() (shared SparkContext); restore the original session
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("text kernels are callable from plain SQL and match the Column API") {
    val prev = SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-text-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import graft.text.TextAnalysis._
      import org.apache.spark.sql.functions.{col, round => rnd}
      val docs = s.read.parquet(s"${SparkTestSession.sf}/documents.parquet")
        .limit(50)
      docs.createOrReplaceTempView("docs_ext")
      val viaSql = s.sql(
        """SELECT doc_id,
          |       graft_token_count(text) AS ntok,
          |       size(graft_word_tokens(text)) AS ntok2,
          |       round(graft_stopword_ratio(text), 6) AS sr,
          |       round(graft_quality(text), 6) AS q,
          |       graft_langid(text) AS lang,
          |       graft_fingerprint(text) AS fp
          |FROM docs_ext""".stripMargin).orderBy("doc_id").collect()
      val viaCol = docs.select(col("doc_id"),
          org.apache.spark.sql.functions.expr(
            s"size(${wordTokens("text")})").as("ntok"),
          rnd(stopwordRatio("text"), 6).as("sr"),
          rnd(qualityScore("text"), 6).as("q"),
          langId("text").as("lang"),
          fingerprint("text").as("fp"))
        .orderBy("doc_id").collect()
      assert(viaSql.length == viaCol.length && viaSql.nonEmpty)
      viaSql.zip(viaCol).foreach { case (a, b) =>
        assert(a.getInt(1) == b.getInt(1))     // token_count
        assert(a.getInt(2) == b.getInt(1))     // word_tokens size agrees
        assert(a.getDouble(3) == b.getDouble(2))
        assert(a.getDouble(4) == b.getDouble(3))
        assert(a.getString(5) == b.getString(4))
        assert(a.getLong(6) == b.getLong(5))
      }
      // arity is enforced with a clear error
      val e = intercept[Exception](s.sql("SELECT graft_quality('a', 'b')"))
      assert(e.getMessage.contains("exactly 1 argument"))
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
