package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ScaleBench.parseBaseline]] against both committed BENCHDETAIL
  * formats (single-pass and the r12 median-of-N protocol that carries a
  * `spread_sec` object BEFORE `queries`), and that format drift fails
  * loudly instead of silently degrading budgets to floor-only. */
class ScaleBenchParseSpec extends AnyFunSuite {
  test("parses the single-pass driver format") {
    val line = """{"metric":"total","value":3.0,"unit":"sec","queries":{"q1_agg":1.5,"q_x":0.5},"ok":{"q1_agg":true,"q_x":true},"all_ok":true,"sf":"d"}"""
    assert(ScaleBench.parseBaseline(line) == Map("q1_agg" -> 1.5, "q_x" -> 0.5))
  }

  test("parses the median-of-N protocol format (spread_sec precedes queries)") {
    val line = """{"metric":"total","value":3.0,"unit":"sec","protocol":"median-of-3, per-query back-to-back, shared harness","runs":3,"spread_sec":{"q1_agg":0.29,"q_x":0.1},"queries":{"q1_agg":1.02,"q_x":0.8},"ok":{"q1_agg":true,"q_x":true},"all_ok":true,"sf":"d"}"""
    assert(ScaleBench.parseBaseline(line) == Map("q1_agg" -> 1.02, "q_x" -> 0.8))
  }

  test("anchors to the LAST metric line, skipping log noise") {
    val noisy =
      "26/01/01 INFO something {\"metric\":\"bogus\"\n" +
        """{"metric":"total","value":1.0,"unit":"sec","queries":{"q_a":1.0},"ok":{"q_a":true},"all_ok":true,"sf":"d"}"""
    assert(ScaleBench.parseBaseline(noisy) == Map("q_a" -> 1.0))
  }

  test("skips trailing log noise that echoes a metric token (ADVICE r12)") {
    val trailing =
      """{"metric":"total","value":1.0,"unit":"sec","queries":{"q_a":1.0},"ok":{"q_a":true},"all_ok":true,"sf":"d"}""" +
        "\n26/01/01 INFO shutdown: wrote output containing \"metric\":\"total\""
    assert(ScaleBench.parseBaseline(trailing) == Map("q_a" -> 1.0))
  }

  test("parses the r14 calibration-anchor format (calibration precedes queries)") {
    val line = """{"metric":"total","value":1.4,"unit":"sec","calibration":{"cal_cpu":0.37,"cal_scan":0.29,"cal_shuffle":1.09},"queries":{"q1_agg":0.44,"q_x":0.97},"ok":{"q1_agg":true,"q_x":true},"all_ok":true,"sf":"d"}"""
    assert(ScaleBench.parseBaseline(line) == Map("q1_agg" -> 0.44, "q_x" -> 0.97))
  }

  test("trailing noise quoting the QUERIES object cannot mis-anchor (ADVICE r13)") {
    // the last token-bearing line is malformed noise — the parser must
    // fall back to the valid JSON line above it, not abort
    val trailing =
      """{"metric":"total","value":1.0,"unit":"sec","queries":{"q_a":1.0},"ok":{"q_a":true},"all_ok":true,"sf":"d"}""" +
        "\n26/01/01 INFO shutdown: echoed \"queries\":{\"q_a\":{oops}"
    assert(ScaleBench.parseBaseline(trailing) == Map("q_a" -> 1.0))
  }

  test("fails loudly on a truncated/drifted queries object") {
    val drifted = """{"metric":"total","queries":{"q_a":{"sec":1.0}},"sf":"d"}"""
    intercept[IllegalArgumentException](ScaleBench.parseBaseline(drifted))
  }
}
