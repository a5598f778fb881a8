package graft

/** Pure parsing + rotation logic behind the bench's self-reporting
  * (regression tripwire baselines, extra-draw rotation).
  *
  * These parsers read the PREVIOUS round's bench_full.json and fail
  * OPEN by design — a missing or unparsable artifact must never crash
  * a bench run, it must disarm the tripwire visibly
  * (`regressed_baseline` records how many entries were parsed, so
  * disarmed ≠ clean in the artifact). That fail-open posture is
  * exactly why the logic lives here instead of inline in
  * [[Bench]].main: a silent format drift between what Bench WRITES and
  * what these parsers READ would disarm the tripwire on every future
  * run (ADVICE r12). BenchParseSpec pins each parser against both a
  * synthetic fixture in the current format and, when present, the
  * repo's committed bench_full.json — so the write and read sides are
  * re-proven compatible on every suite run.
  */
object BenchParse {
  /** All `"name":number` entries of a JSON-object body (no nesting). */
  def numMap(block: String): Map[String, Double] =
    """"([^"]+)":([0-9.Ee+\-]+)""".r.findAllMatchIn(block)
      .map(x => x.group(1) -> x.group(2).toDouble).toMap

  /** Headline warm medians: the FIRST "queries" map in the artifact
    * (the extended series' map nests later in the text). */
  def headlineWarm(txt: String): Map[String, Double] =
    """"queries":\{([^}]*)\}""".r.findFirstMatchIn(txt)
      .map(m => numMap(m.group(1))).getOrElse(Map.empty)

  /** Extended-series warm floors: the first "queries" map nested
    * inside the "extended" section. */
  def extendedWarm(txt: String): Map[String, Double] =
    """(?s)"extended":\{.*?"queries":\{([^}]*)\}""".r
      .findFirstMatchIn(txt).map(m => numMap(m.group(1)))
      .getOrElse(Map.empty)

  /** Headline cold total: the first "cold_total" in the text (the
    * extended section's nests later). */
  def coldTotal(txt: String): Option[Double] =
    """"cold_total":([0-9.Ee+\-]+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toDouble)

  /** The previous run's extra-draw source dir, if it ran (a skipped
    * stand-in has no "src" field and parses to None — rotation then
    * restarts at the sf0.001 draw, the cheap one). */
  def extraDrawSrc(txt: String): Option[String] =
    """"extra_draw":\{"src":"([^"]+)"""".r.findFirstMatchIn(txt)
      .map(_.group(1))

  /** Round-robin rule for the rotating extra-scale certification:
    * last round drew sf0.001 → draw 30× sf0.01 now, and vice versa;
    * no (parsable) previous draw → the sf0.001 one. */
  def pickExtraDraw(prevSrc: Option[String]): (String, Int) =
    if (prevSrc.exists(_.endsWith("sf0.001"))) ("sf0.01", 30)
    else ("sf0.001", 10)

  /** Outcome accounting of one `tools/oracle_check.py` run (ADVICE r13
    * medium + VERDICT r13 #3). The rules a truncated run must obey:
    *
    *  - the trailing `== N pass, M fail ==` summary line is the only
    *    proof the compare ran to the end;
    *  - without it, every query not proven PASS counts as FAILED
    *    (`unreached`) — a mid-stream duckdb crash/OOM can cost pass
    *    rows, it can NEVER present as zero failures;
    *  - dump-side failures (entries `Verify.dump` could not produce)
    *    are failures of the same certification, merged and deduped.
    *
    * Pure so the truncation semantics are spec-pinned (a synthetic
    * kill in BenchParseSpec) instead of only exercised when a real
    * crash happens mid-round. */
  final case class OracleOutcome(passed: Int, failedNames: Seq[String],
      complete: Boolean, unreached: Int) {
    def failCount: Int = failedNames.size + unreached
  }

  def oracleOutcome(out: String, checked: Int,
      dumpFailed: Seq[String]): OracleOutcome = {
    val lines = out.linesIterator.toSeq
    val passed = lines.count(_.startsWith("PASS "))
    val failedNames = (lines.collect {
      case l if l.startsWith("FAIL ") =>
        l.stripPrefix("FAIL ").takeWhile(c => c != ':' && c != ' ')
    } ++ dumpFailed).distinct.sorted
    val complete = lines.exists(_.startsWith("== "))
    val unreached =
      if (complete) 0
      else math.max(0, checked - passed - failedNames.size)
    OracleOutcome(passed, failedNames, complete, unreached)
  }
}
