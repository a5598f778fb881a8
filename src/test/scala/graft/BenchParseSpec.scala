package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's artifact parsers and the extra-draw rotation rule.
  *
  * The parsers fail OPEN (missing artifact ⇒ disarmed-but-visible
  * tripwire), so nothing at runtime would flag a silent format drift
  * between what Bench writes and what BenchParse reads — this spec is
  * that flag: a fixture in the current format AND, when present, the
  * repo's committed bench_full.json must both parse to non-empty
  * baselines.
  */
class BenchParseSpec extends AnyFunSuite {
  // a structurally faithful miniature of bench_full.json: headline
  // "queries" first, per-rep maps, nested extended section with its own
  // queries/cold_total, decade sections, extra_draw, tripwire fields
  private val fixture =
    """{"metric":"total","value":27.363,"unit":"sec",""" +
      """"queries":{"q1_agg":0.123,"graph_pagerank":4.4E-1},""" +
      """"queries_cold":{"q1_agg":0.5,"graph_pagerank":1.2},""" +
      """"queries_reps":{"q1_agg":{"cold":0.5,"settle":0.2,"warm_reps":[0.1,0.12,0.13],"t_start":[1.0,2.0,3.0]}},""" +
      """"rep_gc":true,"cold_total":47.97,"build_sec":9.6,""" +
      """"extended":{"value":90.3,"unit":"sec","n_queries":2,""" +
      """"queries":{"media_card":2.4,"stream_ann_live":4.0},""" +
      """"queries_cold":{"media_card":4.4,"stream_ann_live":6.0},""" +
      """"cold_total":133.0,"failed":[]},""" +
      """"scale_decade":{"dir":"/x","fingerprint":"f","rows_factor":10,""" +
      """"panel":["media_card"],"queries":{"media_card":{"warm_10x":8.2,"warm":2.4,"ratio":3.4}},""" +
      """"superlinear":[],"failed":[]},""" +
      """"decade_correctness":{"dir":"/x","fingerprint":"f","checked":191,"pass":191,"fail":0},""" +
      """"extra_draw":{"src":"/root/testdata/sf0.001","rows_factor":10,"pass":191,"fail":0},""" +
      """"regressed":[],"regressed_ext":[],""" +
      """"regressed_baseline":{"found":true,"headline_entries":57,"extended_entries":138},""" +
      """"failed":[],"sf":"/root/testdata/sf0.1"}"""

  test("headline warm map is the FIRST queries map, not a nested one") {
    val m = BenchParse.headlineWarm(fixture)
    assert(m == Map("q1_agg" -> 0.123, "graph_pagerank" -> 0.44))
  }

  test("extended warm map is the one nested in the extended section") {
    val m = BenchParse.extendedWarm(fixture)
    assert(m == Map("media_card" -> 2.4, "stream_ann_live" -> 4.0))
  }

  test("cold total is the headline one, not the extended section's") {
    assert(BenchParse.coldTotal(fixture).contains(47.97))
  }

  test("extra-draw src parses, and a skipped stand-in parses to None") {
    assert(BenchParse.extraDrawSrc(fixture)
      .contains("/root/testdata/sf0.001"))
    val skipped = fixture.replace(
      """"extra_draw":{"src":"/root/testdata/sf0.001","rows_factor":10,"pass":191,"fail":0}""",
      """"extra_draw":{"skipped":true,"reason":"SPARK_GRAFT_EXTRA_DRAW=off"}""")
    assert(BenchParse.extraDrawSrc(skipped).isEmpty)
  }

  test("rotation: 10x sf0.001 -> 30x sf0.01 -> 100x sf0.001 -> back") {
    assert(BenchParse.pickExtraDraw(Some(("/root/testdata/sf0.001", 10))) ==
      ("sf0.01", 30))
    assert(BenchParse.pickExtraDraw(Some(("/root/testdata/sf0.01", 30))) ==
      ("sf0.001", 100))
    assert(BenchParse.pickExtraDraw(Some(("/root/testdata/sf0.001", 100))) ==
      ("sf0.001", 10))
    assert(BenchParse.pickExtraDraw(None) == ("sf0.001", 10))
  }

  test("extra draw parses as (src, factor); a pre-r15 artifact without a readable factor falls back by src") {
    assert(BenchParse.extraDraw(fixture) ==
      Some(("/root/testdata/sf0.001", 10)))
    // factor field torn/absent: the two-way era's draws are identified
    // by source alone
    val noFactor = fixture.replace(
      """"extra_draw":{"src":"/root/testdata/sf0.001","rows_factor":10,""",
      """"extra_draw":{"src":"/root/testdata/sf0.001",""")
    assert(BenchParse.extraDraw(noFactor) ==
      Some(("/root/testdata/sf0.001", 10)))
    val noFactor01 = fixture.replace(
      """"extra_draw":{"src":"/root/testdata/sf0.001","rows_factor":10,""",
      """"extra_draw":{"src":"/root/testdata/sf0.01",""")
    assert(BenchParse.extraDraw(noFactor01) ==
      Some(("/root/testdata/sf0.01", 30)))
  }

  test("history round-trips, caps at 5 most-recent, and keeps absent entries' tails") {
    val prev = Map("a" -> Seq(1.0, 2.0, 3.0, 4.0, 5.0), "b" -> Seq(9.0))
    val txt = BenchParse.historyJson(prev,
      Map("a" -> 6.0, "c" -> 0.5), "/root/testdata/sf0.1", cpus = "32")
    assert(BenchParse.historySf(txt).contains("/root/testdata/sf0.1"))
    assert(BenchParse.historyCpus(txt).contains("32"))
    val h = BenchParse.history(txt)
    assert(h("a") == Seq(2.0, 3.0, 4.0, 5.0, 6.0)) // capped, oldest dropped
    assert(h("b") == Seq(9.0)) // absent from this run: tail retained
    assert(h("c") == Seq(0.5))
    // garbage fails open
    assert(BenchParse.history("").isEmpty &&
      BenchParse.history("{nope").isEmpty)
  }

  test("cpus tag fails CLOSED: a 4-core run against a 32-core history neither arms nor appends") {
    // VERDICT r16 #2: the committed bands are 32-core draws, Bench
    // defaults to local[4], and SPARK_GRAFT_CPUS is history-neutral —
    // a forgotten CPUS=32 must not append inflated mid-band walls.
    // Bench gates both the ARM (historyTxt filter) and the WRITE
    // (historyReadOk) on historyCpus(txt).contains(cpus), so the
    // pinned behavior is: mismatch and missing-tag both fail the
    // contains check.
    val txt = BenchParse.historyJson(Map("a" -> Seq(1.0, 1.1, 1.2)),
      Map("a" -> 1.05), "/root/testdata/sf0.1", cpus = "32")
    assert(BenchParse.historyCpus(txt).contains("32"))
    assert(!BenchParse.historyCpus(txt).contains("4"),
      "a 4-core run must not match a 32-core history")
    // a pre-r17 history (no cpus field) fails closed too: unknown
    // provenance never arms
    val legacy = """{"sf":"/root/testdata/sf0.1","cap":5,""" +
      """"entries":{"a":[1.0,1.1,1.2]}}"""
    assert(BenchParse.historyCpus(legacy).isEmpty,
      "missing cpus tag must parse to None (fail closed via contains)")
    // and garbage fails closed, not open
    assert(BenchParse.historyCpus("").isEmpty &&
      BenchParse.historyCpus("{nope").isEmpty)
  }

  test("band verdict: >=3 draws flag only an exit from the band; thin bands fall back to 1.5x-prev") {
    val band = Seq(1.0, 1.2, 0.9)
    // inside the band (even above the single previous draw's 1.5x)
    assert(!BenchParse.bandRegressed(1.5, band, Some(0.9)))
    // 3-draw band has no trim room: exits max(band)*1.3 = 1.56
    assert(BenchParse.bandRegressed(1.6, band, Some(0.9)))
    // thin band: single-baseline rule
    assert(BenchParse.bandRegressed(1.6, Seq(1.0), Some(1.0)))
    assert(!BenchParse.bandRegressed(1.4, Seq(1.0), Some(1.0)))
    // sub-0.2s never flags; no baseline at all never flags
    assert(!BenchParse.bandRegressed(0.19, band, Some(0.01)))
    assert(!BenchParse.bandRegressed(5.0, Nil, None))
  }

  test("arm threshold: one outlier draw does not widen it, a genuine 2x exit still fires") {
    // ann_ip_mips' real seeded band shape (VERDICT r15 #1): one r12-era
    // noisy draw at 0.561 over a 0.18 s median. The r15 rule armed at
    // 1.3*max = 0.73 ≈ 4x the median — a real 3x regression was
    // invisible. Trimmed, the arm is median-floored at 0.27.
    val outlier = Seq(0.159, 0.17, 0.18, 0.19, 0.561)
    val arm = BenchParse.armThreshold(outlier)
    assert(arm < 0.3, s"outlier draw widened the arm to $arm")
    assert(BenchParse.bandRegressed(0.36, outlier, None),
      "a genuine 2x-of-median exit must fire despite the historic outlier")
    assert(!BenchParse.bandRegressed(0.26, outlier, None),
      "inside the trimmed band + noise floor must not fire")
    // median floor: a coincidentally tight cluster must not arm inside
    // the pinned +-30-40% quiet-box noise width
    val tight = Seq(0.5, 0.5, 0.5, 0.5, 0.5)
    assert(BenchParse.armThreshold(tight) == 0.75)
    assert(!BenchParse.bandRegressed(0.7, tight, None))
    assert(BenchParse.bandRegressed(0.8, tight, None))
  }

  test("the COMMITTED history's bands arm within ~1.5x of their median for >=90% of entries") {
    // VERDICT r15 #1's acceptance criterion, measured against the real
    // seeded history (each band carries one r12-era noisy draw).
    //
    // RE-BASELINING (ADVICE r16): this test pins a bound against a
    // ROLLING artifact — a future LEGITIMATELY accepted noisier draw
    // (or a catalog shrink below 150 banded entries) can fail it with
    // no code change. When that happens, the expected action is NOT to
    // edit bench_history.json (never delete accepted draws): first
    // verify the new draw was band-eligible (history_write:true in its
    // committed bench_full.json, nothing in history_skip_env), then
    // re-derive the dispersion on the updated file and lower the 0.9
    // ratio / 150 floor here to the measured value, citing the round in
    // this comment. The constants are an acceptance MEASUREMENT of the
    // armThreshold rule against real data, not a property of the code —
    // drift in them is information, and this pin is what surfaces it.
    val f = new java.io.File("bench_history.json")
    assume(f.isFile, "no committed bench_history.json in the working dir")
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val armed = BenchParse.history(txt).values.filter(_.size >= 3).toSeq
    assert(armed.size >= 150,
      s"only ${armed.size} bands have >=3 draws — catalog shrink or " +
        "history damage; see the RE-BASELINING note above")
    val within = armed.count { b =>
      val med = b.sorted.apply(b.size / 2)
      BenchParse.armThreshold(b) <= 1.55 * med
    }
    assert(within.toDouble / armed.size >= 0.9,
      s"only $within of ${armed.size} bands arm within 1.55x of median " +
        "— if the newest accepted draw is legitimate, re-baseline per " +
        "the RE-BASELINING note above instead of editing the history")
  }

  test("history write eligibility is structural: any non-default bench knob disqualifies") {
    // VERDICT r15 #2: r15's seeding draw was hand-excluded from the
    // band history; now a forced draw / non-default deadline / diverted
    // artifact can never append (Bench gates the write on this being
    // empty, so the committed file stays byte-identical on such runs)
    val neutral = Seq("SPARK_GRAFT_SF_DIR", "SPARK_GRAFT_CPUS",
      "SPARK_GRAFT_BENCH_HISTORY", "HOME", "PATH")
    assert(BenchParse.nonDefaultBenchEnv(neutral).isEmpty)
    assert(BenchParse.nonDefaultBenchEnv(
      neutral :+ "SPARK_GRAFT_EXTRA_DRAW") == Seq("SPARK_GRAFT_EXTRA_DRAW"))
    assert(BenchParse.nonDefaultBenchEnv(
      Seq("SPARK_GRAFT_BENCH_DEADLINE", "SPARK_GRAFT_BENCH_FULL")) ==
      Seq("SPARK_GRAFT_BENCH_DEADLINE", "SPARK_GRAFT_BENCH_FULL"))
  }

  test("history probes: round-trip beside the draws, capped, reserved key never parses as an entry") {
    val txt = BenchParse.historyJson(
      Map("a" -> Seq(1.0)), Map("a" -> 2.0), "/root/testdata/sf0.1",
      prevProbes = Seq(0.10, 0.11, 0.12, 0.13, 0.14), probe = Some(0.15),
      cpus = "32")
    assert(BenchParse.historyProbes(txt) ==
      Seq(0.11, 0.12, 0.13, 0.14, 0.15)) // capped, oldest dropped
    assert(BenchParse.history(txt) == Map("a" -> Seq(1.0, 2.0)),
      "the probes array must not parse as a band entry")
    // a failed probe (-1) is never appended; pre-r16 files have no
    // probes array and fail open to empty
    val noP = BenchParse.historyJson(Map.empty, Map("a" -> 1.0),
      "/root/testdata/sf0.1", prevProbes = Seq.empty, probe = Some(-1.0),
      cpus = "32")
    assert(BenchParse.historyProbes(noP).isEmpty)
    assert(BenchParse.historyProbes("""{"sf":"x","entries":{}}""").isEmpty)
  }

  test("io probes: round-trip beside the cpu probes, reserved keys never collide or parse as entries") {
    val txt = BenchParse.historyJson(
      Map("a" -> Seq(1.0)), Map("a" -> 2.0), "/root/testdata/sf0.1",
      prevProbes = Seq(0.10), probe = Some(0.11), cpus = "32",
      prevIoProbes = Seq(0.31, 0.32, 0.33, 0.34, 0.35),
      ioProbe = Some(0.36))
    assert(BenchParse.historyIoProbes(txt) ==
      Seq(0.32, 0.33, 0.34, 0.35, 0.36)) // capped, oldest dropped
    // the two reserved arrays are DISTINCT: "probes" must not read the
    // io array and vice versa (the io_ prefix sits inside the quotes)
    assert(BenchParse.historyProbes(txt) == Seq(0.10, 0.11))
    assert(BenchParse.history(txt) == Map("a" -> Seq(1.0, 2.0)),
      "reserved arrays must not parse as band entries")
    // a failed io probe (-1) is never appended; pre-r17 files have no
    // io_probes array and fail open to empty (annotation omitted)
    val noIo = BenchParse.historyJson(Map.empty, Map("a" -> 1.0),
      "/root/testdata/sf0.1", cpus = "32", ioProbe = Some(-1.0))
    assert(BenchParse.historyIoProbes(noIo).isEmpty)
    val committed = new java.io.File("bench_history.json")
    if (committed.isFile) {
      val c = new String(java.nio.file.Files.readAllBytes(
        committed.toPath), java.nio.charset.StandardCharsets.UTF_8)
      // pre-r17 committed file: io annotation absent, cpu probes intact
      assert(BenchParse.historyIoProbes(c).size <= BenchParse.HistoryCap)
    }
  }

  test("a phase-1 partial artifact arms baselines; pending extra_draw is None") {
    // r14 two-phase emission: a run killed mid-cert leaves an artifact
    // with "partial":true and pending cert stand-ins — the next run must
    // still arm its headline/extended tripwires from it, and the
    // extra-draw rotation must treat the pending draw as absent
    val p = fixture
      .replace(""""unit":"sec",""", """"unit":"sec","partial":true,""")
      .replace(
        """"extra_draw":{"src":"/root/testdata/sf0.001","rows_factor":10,"pass":191,"fail":0}""",
        """"extra_draw":{"pending":true,"reason":"certification had not yet run when this artifact generation was written"}""")
    assert(BenchParse.headlineWarm(p) ==
      Map("q1_agg" -> 0.123, "graph_pagerank" -> 0.44))
    assert(BenchParse.extendedWarm(p) ==
      Map("media_card" -> 2.4, "stream_ann_live" -> 4.0))
    assert(BenchParse.coldTotal(p).contains(47.97))
    assert(BenchParse.extraDrawSrc(p).isEmpty)
  }

  test("garbage and empty inputs fail open to empty baselines") {
    Seq("", "not json at all", """{"queries":}""").foreach { bad =>
      assert(BenchParse.headlineWarm(bad).isEmpty)
      assert(BenchParse.extendedWarm(bad).isEmpty)
      assert(BenchParse.coldTotal(bad).isEmpty)
      assert(BenchParse.extraDrawSrc(bad).isEmpty)
    }
  }

  test("oracle outcome: a complete run counts passes, fails, dump failures") {
    val out =
      """PASS q1_agg (4 rows) [0.12s]
        |PASS knn_cosine (10 rows) [0.30s]
        |FAIL media_card: rows spark=20 oracle=21 first-diffs=[3]
        |   spark:  (('i', 1),)
        |[oracle] serial retry of 1/4: media_card (FAIL media_card: rows)
        |FAIL media_card: rows spark=20 oracle=21 first-diffs=[3]
        |== 2 pass, 1 fail ==
        |""".stripMargin
    val oc = BenchParse.oracleOutcome(out, checked = 4,
      dumpFailed = Seq("stream_ann_live"))
    assert(oc.complete)
    assert(oc.passed == 2)
    assert(oc.failedNames == Seq("media_card", "stream_ann_live"))
    assert(oc.unreached == 0 && oc.failCount == 2)
  }

  test("oracle outcome: a KILLED run can never present as zero failures") {
    // synthetic mid-stream kill (VERDICT r13 #3 / ADVICE r13): the
    // driver's r13 extra draw died at 55/191 with fail:0 — the exact
    // shape this accounting forbids. No "== " summary line ⇒ every
    // query not proven PASS is a counted failure.
    val out = (1 to 55).map(i => s"PASS q$i (10 rows) [0.5s]")
      .mkString("", "\n", "\nPAS") // torn mid-line, not a countable PASS
    val oc = BenchParse.oracleOutcome(out, checked = 191,
      dumpFailed = Nil)
    assert(!oc.complete)
    assert(oc.passed == 55)
    assert(oc.unreached == 136 && oc.failCount == 136)
    // and an empty output (crashed before the first line) fails whole
    val dead = BenchParse.oracleOutcome("", checked = 191, dumpFailed = Nil)
    assert(!dead.complete && dead.failCount == 191)
  }

  test("the COMMITTED bench_history.json still parses to armed bands") {
    val f = new java.io.File("bench_history.json")
    assume(f.isFile, "no committed bench_history.json in the working dir")
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(BenchParse.historySf(txt).contains("/root/testdata/sf0.1"))
    assert(BenchParse.historyCpus(txt).contains("32"),
      "the committed bands are 32-core draws and must carry the tag " +
        "(r17 migration) — a missing tag disarms every band")
    val h = BenchParse.history(txt)
    assert(h.size >= 150,
      s"band history shrank to ${h.size} entries — format drift?")
    assert(h.values.forall(b => b.nonEmpty &&
      b.size <= BenchParse.HistoryCap && b.forall(v => v >= 0 && v < 600)))
    // the bands must actually arm the >=3-draw verdict for most entries
    assert(h.values.count(_.size >= 3) >= 150)
  }

  test("the COMMITTED bench_full.json still parses to armed baselines") {
    // the real write-side compatibility gate: if Bench's output format
    // drifts, this fails on the next committed artifact
    val f = new java.io.File("bench_full.json")
    assume(f.isFile, "no committed bench_full.json in the working dir")
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val head = BenchParse.headlineWarm(txt)
    val ext = BenchParse.extendedWarm(txt)
    assert(head.size >= 50,
      s"headline baseline shrank to ${head.size} entries — format drift?")
    assert(ext.size >= 100,
      s"extended baseline shrank to ${ext.size} entries — format drift?")
    assert(head.values.forall(v => v >= 0 && v < 600))
    assert(BenchParse.coldTotal(txt).exists(v => v > 0 && v < 3600))
  }
}
