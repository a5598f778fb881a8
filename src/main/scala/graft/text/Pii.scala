package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction kernels for training-data pipelines: the
  * scrub pass every large corpus runs before anything else sees the
  * text. Spark side uses codegen'd `regexp_count`/`regexp_replace`
  * (embarrassingly parallel per row, no shuffle, linear at 100 TB);
  * DuckDB twins evaluate the identical patterns, so the sweep is fully
  * oracled.
  *
  * Patterns deliberately stay inside the regex subset Java's engine and
  * RE2 (DuckDB) interpret identically: character classes, bounded
  * quantifiers, word boundaries — no lookaround, no backreferences.
  * (The reference engine has no scrub stage; this extends its text
  * surface the way `/root/reference/hybrid_search.py:71-75` tokenizes —
  * plain per-row regex passes.)
  */
object Pii {
  val EmailPat = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhonePat = """\b\d{3}-\d{4}\b"""
  val Ipv4Pat = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  val EmailTag = "[EMAIL]"
  val PhoneTag = "[PHONE]"
  val IpTag = "[IP]"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPat))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePat))
  def ipCount(text: Column): Column = regexp_count(text, lit(Ipv4Pat))

  /** All three patterns replaced by their tags. IP runs before PHONE so
    * a dotted quad can never be half-eaten by the phone pattern; EMAIL
    * runs first because its local part may contain digits the other
    * patterns would otherwise nibble at. One fixed order keeps the
    * result deterministic and lets the oracle chain identically. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailPat), lit(EmailTag)),
        lit(Ipv4Pat), lit(IpTag)),
      lit(PhonePat), lit(PhoneTag))

  // DuckDB twins ('g' = replace all, matching Spark's regexp_replace).
  def emailCountSql(t: String): String =
    s"len(regexp_extract_all($t, '$EmailPat'))"
  def phoneCountSql(t: String): String =
    s"len(regexp_extract_all($t, '$PhonePat'))"
  def ipCountSql(t: String): String =
    s"len(regexp_extract_all($t, '$Ipv4Pat'))"
  def redactSql(t: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($t, " +
      s"'$EmailPat', '$EmailTag', 'g'), " +
      s"'$Ipv4Pat', '$IpTag', 'g'), " +
      s"'$PhonePat', '$PhoneTag', 'g')"
}
