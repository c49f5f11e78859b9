package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures a bounded 2000-byte TAIL of the sbt log: a
  * short line that outgrows it loses its HEAD and parses as null
  * (BENCH_r02). The suite grows every round — pin the budget at a
  * 140-query hypothetical (current: 124) so the clip is caught here,
  * not in a driver run. */
class BenchLineSpec extends AnyFunSuite {

  test("short bench line stays under the driver tail window at 140 queries") {
    val n = 140
    // padded full names: shortLine must truncate to the qNN id
    val timed = (1 to n).map(i =>
      s"q$i" + "_some_long_descriptive_operator_name" -> 7.77)
    // the full probe schedule (initial + per pass: start, every 25,
    // end) — shortLine must trim to starts/ends
    val sched = Seq(0 -> 0.86) ++ (0 to 1).flatMap(_ =>
      Seq(0 -> 0.74, 25 -> 0.66, 50 -> 0.61, 75 -> 0.63, 100 -> 0.68,
        125 -> 0.7, n -> 0.71))
    val line = Bench.shortLine(total = 107.77, probeSec = 0.86,
      probes = sched, memProbes = sched.map { case (p, s) => (p, s * 2) },
      shuffleSeed = None, timed = timed, failed = Nil,
      sfDir = "/root/testdata/sf0.1", nQueries = n)
    // hard driver window is 2000 bytes; pin with >=170 bytes of margin
    // (r14: +21 bytes for the bench_semantics stamp moved the pin)
    assert(line.length <= 1830, s"short line is ${line.length} bytes")
    assert(line.startsWith("{\"metric\":\"total\""), "driver parses head-anchored")
    assert(line.contains("\"queries\":{\"q1\":7.77,"), "qNN truncation")
    // probes trimmed to pass starts/ends only: initial + 2×(start, end)
    assert(line.contains("\"probes\":[[0,0.86],[0,0.74],[140,0.71],[0,0.74],[140,0.71]]"))
    // still well-formed JSON with the contract keys
    for (k <- Seq("\"value\":", "\"unit\":\"sec\"", "\"probe_sec\":",
                  "\"failed\":[]", "\"sf\":",
                  s""""bench_semantics":${Bench.BenchSemantics}"""))
      assert(line.contains(k), s"missing $k")
  }

  test("shuffle seed rides the short line when set") {
    val line = Bench.shortLine(1.0, 0.9, Seq(0 -> 0.9), Seq(0 -> 1.8),
      Some(42L), Seq("q1_x" -> 1.0), Nil, "/tmp/sf", 1)
    assert(line.contains("\"shuffle_seed\":42"))
  }

  test("fmt2 strips trailing zeros losslessly") {
    assert(Bench.fmt2(0.5) === "0.5")
    assert(Bench.fmt2(3.0) === "3")
    assert(Bench.fmt2(12.34) === "12.34")
    assert(Bench.fmt2(0.0) === "0")
    assert(Bench.fmt2(102.29) === "102.29")
  }
}
