package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs the tools/-level pure-function unit tests under `sbt test`, so
  * a scheduler regression in the oracle comparer (tools/oracle_check.py
  * — the driver's correctness-gate replica) fails the suite instead of
  * surfacing rounds later as a 1,239 s main-lane chain at a 100× corpus
  * (the r15 pre-flight catch, VERDICT r15 #5). Skips only when the
  * python3+duckdb toolchain is absent (it is present on the driver box
  * and this one; oracle_check imports duckdb at module scope).
  */
class ToolsSpec extends AnyFunSuite {
  test("oracle_check main-tier selection rules (tools/test_oracle_tier.py)") {
    val probe = try {
      new ProcessBuilder("python3", "-c", "import duckdb")
        .start().waitFor() == 0
    } catch { case scala.util.control.NonFatal(_) => false }
    assume(probe, "python3+duckdb unavailable — tools tests skipped")
    val p = new ProcessBuilder("python3", "tools/test_oracle_tier.py")
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(p.waitFor() == 0, s"tier tests failed:\n$out")
    assert(out.contains("== all tier tests passed =="), out)
  }
}
