package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact must be self-adjudicating: a query that throws during
  * a rep must surface as an error marker in the JSON, never as a wall time
  * (a crash completes fast — masked, it would read as a GOOD number), and
  * every raw rep time must be present so a one-rep host stall is
  * distinguishable from a genuine plan regression.
  */
class BenchSpec extends AnyFunSuite {

  test("timeReps records err for a throwing rep, timings for clean reps") {
    var n = 0
    val raws = Bench.timeReps(() => {
      n += 1
      if (n == 2) sys.error("boom")
    }, 3)
    assert(raws.length == 3)
    assert(raws(0).isRight && raws(2).isRight)
    assert(raws(1) == Left("boom"))
  }

  test("renderJson: errored query reports \"err\" and is excluded from value") {
    val results = Seq(
      "good" -> Seq(Right(0.5), Right(0.3), Right(0.4)).asInstanceOf[Seq[Either[String, Double]]],
      "broken" -> Seq(Right(0.1), Left("kaboom: \"quoted\"\npath"), Right(0.1)))
    val json = Bench.renderJson(results, "/tmp/sf", 3, Seq((-1, 0.12), (1, 0.13)))
    // the broken query never contributes a number anywhere
    assert(json.contains("\"broken\":\"err\""))
    assert(json.contains("\"good\":0.400"))
    assert(json.contains("\"value\":0.400")) // only the clean query's median
    assert(json.contains("\"errored\":1"))
    assert(json.contains("\"kaboom:"))
    // all raw reps present, errored rep marked
    assert(json.contains("\"good\":[0.500,0.300,0.400]"))
    assert(json.contains("\"broken\":[0.100,\"err\",0.100]"))
    // message with quote/newline stays valid JSON (escaped)
    assert(!json.split("\\\\n").exists(_ == "path")) // no raw newline
    assert(json.contains("\\\"quoted\\\""))
  }

  test("renderJson: all-clean run has empty errors and full total") {
    val results = Seq(
      "a" -> Seq[Either[String, Double]](Right(1.0)),
      "b" -> Seq[Either[String, Double]](Right(2.0)))
    val json = Bench.renderJson(results, "/tmp/sf", 1, Seq((-1, 0.1)))
    assert(json.contains("\"value\":3.000"))
    assert(json.contains("\"errors\":{}"))
    assert(json.contains("\"errored\":0"))
    assert(json.contains("\"cpu_calib_sec\":[0.100]"))
    assert(json.contains("\"calib_at\":[-1]"))
  }

  test("familyOf groups by the pre-underscore prefix") {
    assert(Bench.familyOf("dedup_jaccard_prefix") == "dedup")
    assert(Bench.familyOf("q1_agg") == "q1")
    assert(Bench.familyOf("concurrency") == "concurrency")
  }
}
