package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Text-analysis kernels for training-data pipelines: token counting,
  * quality scoring, marker-token language ID, and an order-sensitive
  * rolling-hash document fingerprint.
  *
  * Every kernel is pure integer/double arithmetic over built-in SQL
  * functions so the DuckDB oracle evaluates the *identical* formula
  * (each Spark expression has a `...Sql` twin in DuckDB dialect). Hash
  * constants: polynomial base 31 over ASCII codes mod 2^31−1 per token,
  * then base 1000003 over token hashes — an order-sensitive rolling hash
  * (reordered tokens change the fingerprint, unlike a bag-of-words sum).
  *
  * All kernels are embarrassingly parallel per row (no shuffle), so they
  * scale linearly with input splits at 100 TB.
  */
object TextAnalysis {
  val HashM = 2147483647L // 2^31 − 1
  val CharB = 31L
  val TokB = 1000003L

  /** Whitespace tokens of a text column (Spark side). */
  def wsTokens(text: String): String = s"split(trim($text), '\\\\s+')"
  def wsTokensSql(text: String): String =
    s"string_split_regex(trim($text), '\\s+')"

  /** Word tokens: \w+ runs (the reference's BM25 tokenizer shape,
    * hybrid_search.py:71-75, lowercased upstream). */
  def wordTokens(text: String): String =
    s"regexp_extract_all(lower($text), '\\\\w+', 0)"
  def wordTokensSql(text: String): String =
    s"regexp_extract_all(lower($text), '\\w+')"

  /** BPE-ish pre-tokenizer: the GPT-2 pattern family (contraction
    * suffixes | space?-letters | space?-digits | space?-punctuation run),
    * restricted to the lookahead-free subset Java's engine and RE2
    * (DuckDB) interpret identically — the \\s+(?!\\S) trailing-space
    * branch is dropped (runs of spaces fold into the next token's
    * optional leading space, matching how token COUNTS are used for
    * budget accounting). This is the "how many tokens will the trainer
    * see" estimator, distinct from the \\w+ indexing tokenizer above. */
  private val BpePat =
    """'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"""
  /** Column-API form (the pattern contains a quote — going through the
    * DSL sidesteps two layers of SQL-literal escaping). Group 0 = whole
    * match (the pattern's only group is non-capturing). */
  def bpeTokens(text: Column): Column =
    org.apache.spark.sql.functions.regexp_extract_all(
      text, org.apache.spark.sql.functions.lit(BpePat),
      org.apache.spark.sql.functions.lit(0))
  def bpeTokensSql(text: String): String =
    s"regexp_extract_all($text, '${BpePat.replace("'", "''")}')"

  /** Per-token polynomial hash: fold (acc·31 + ascii(char)) mod M.
    * Public: the dedup operators hash shingles with the same kernel. */
  // Lambda variables are deliberately obscure (`gci`/`gca`/`gcc`): the
  // argument `t` is an arbitrary caller expression that may itself sit
  // inside an outer lambda (e.g. the shingle window variable) — a generic
  // `i` here would shadow the caller's `i` and silently hash garbage.
  def charHash(t: String): String =
    s"aggregate(transform(sequence(1, length($t)), gci -> ascii(substring($t, gci, 1))), " +
      s"0L, (gca, gcc) -> (gca * $CharB + gcc) % $HashM)"
  // DuckDB list_reduce has no init value — prepend the 0 seed.
  def charHashSql(t: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length($t)+1), " +
      s"gci -> ascii(substr($t, gci, 1))::BIGINT)), (gca, gcc) -> (gca * $CharB + gcc) % $HashM)"

  /** Order-sensitive rolling fingerprint over the word tokens. */
  def fingerprint(text: String): Column = expr(fingerprintStr(text))
  def fingerprintStr(text: String): String =
    s"aggregate(${wordTokens(text)}, 0L, " +
      s"(acc, t) -> (acc * $TokB + ${charHash("t")}) % $HashM)"
  def fingerprintSql(text: String): String =
    s"list_reduce(list_prepend(0::BIGINT, " +
      s"list_transform(${wordTokensSql(text)}, t -> ${charHashSql("t")})), " +
      s"(acc, h) -> (acc * $TokB + h) % $HashM)"

  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")
  private def stopList = Stopwords.map(s => s"'$s'").mkString(", ")

  /** Fraction of word tokens that are stopwords (NULL on empty text).
    * The `Str` forms are public for the SQL-function registration in
    * GraftExtensions (it parses them into Catalyst trees). */
  def stopwordRatioStr(text: String): String =
    s"cast(size(filter(${wordTokens(text)}, t -> t in ($stopList))) as double)" +
      s" / nullif(size(${wordTokens(text)}), 0)"
  def stopwordRatio(text: String): Column = expr(stopwordRatioStr(text))
  def stopwordRatioSql(text: String): String =
    s"len(list_filter(${wordTokensSql(text)}, t -> t in ($stopList)))::DOUBLE" +
      s" / nullif(len(${wordTokensSql(text)}), 0)"

  /** Mean token length = total token chars / token count. */
  def meanTokenLen(text: String): Column = expr(
    s"cast(aggregate(${wordTokens(text)}, 0, (a, t) -> a + length(t)) as double)" +
      s" / nullif(size(${wordTokens(text)}), 0)")
  def meanTokenLenSql(text: String): String =
    s"list_reduce(list_prepend(0, list_transform(${wordTokensSql(text)}, " +
      s"t -> length(t))), (a, b) -> a + b)::DOUBLE" +
      s" / nullif(len(${wordTokensSql(text)}), 0)"

  /** Composite quality score ∈ [0,1]: length saturation (50 tokens = full
    * credit) damped by stopword density. */
  def qualityScore(text: String): Column = expr(qualityScoreStr(text))
  def qualityScoreStr(text: String): String =
    s"least(1.0, size(${wordTokens(text)}) / 50.0) * " +
      s"(1.0 - 0.5 * (${stopwordRatioStr(text)}))"
  def qualityScoreSql(text: String): String =
    s"least(1.0, len(${wordTokensSql(text)}) / 50.0) * " +
      s"(1.0 - 0.5 * (${stopwordRatioSql(text)}))"

  /** Marker-token language profiles for the n-gram-heuristic language ID.
    * (The testdata corpus is synthetic English-ish filler for every lang
    * label, so the interesting output is the mechanism + confusion matrix,
    * not accuracy.) */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  private def markerCount(text: String, markers: Seq[String]): String = {
    val list = markers.map(m => s"'$m'").mkString(", ")
    s"size(filter(${wordTokens(text)}, t -> t in ($list)))"
  }
  private def markerCountSql(text: String, markers: Seq[String]): String = {
    val list = markers.map(m => s"'$m'").mkString(", ")
    s"len(list_filter(${wordTokensSql(text)}, t -> t in ($list)))"
  }

  /** Predicted language: argmax marker count, first-profile-wins ties,
    * 'und' (undetermined) when no marker hits at all. */
  def langId(text: String): Column = expr(langIdStr(text))
  /** Spark-dialect SQL string of [[langId]] (public: the SQL-function
    * registration in GraftExtensions parses it into a Catalyst tree). */
  def langIdStr(text: String): String =
    caseChainStr(LangMarkers.map { case (l, ms) => l -> markerCount(text, ms) })
  def langIdSql(text: String): String = {
    val counts = LangMarkers.map { case (l, ms) => l -> markerCountSql(text, ms) }
    caseChainStr(counts)
  }

  private def caseChain(counts: Seq[(String, String)]): Column =
    expr(caseChainStr(counts))

  private def caseChainStr(counts: Seq[(String, String)]): String = {
    val exprs = counts.map(_._2)
    val whens = counts.zipWithIndex.map { case ((lang, c), i) =>
      val others = exprs.zipWithIndex.collect { case (e, j) if j != i => e }
      s"WHEN $c > 0 AND $c >= greatest(${others.mkString(", ")}) THEN '$lang'"
    }
    s"CASE ${whens.mkString(" ")} ELSE 'und' END"
  }
}
