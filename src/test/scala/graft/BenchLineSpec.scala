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
      sfDir = "/root/testdata/sf0.1", nQueries = n,
      // budget-pin the worst case: the window stamp fired (r15)
      windowField = ""","window_suspect":[1.92,1.67]""")
    // hard driver window is 2000 bytes; pin with >=140 bytes of margin
    // (r14: +21 bytes for bench_semantics; r15: +31 for window_suspect)
    assert(line.length <= 1860, s"short line is ${line.length} bytes")
    assert(line.contains(""","window_suspect":[1.92,1.67],"""))
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

  // --- windowStamp (r15): the run labels its own host window ---

  // a driver-wrapper-shaped record: the bench line rides in a "tail"
  // string field with ESCAPED quotes — the REAL BENCH_r*.json format
  // (\"probe_sec\":1.9). The r15 fixture originally used unescaped
  // keys inside the tail, which is why the regex bug (stamp never
  // firing against driver records) survived its own spec.
  private def rec(probe: Double, mem: Double, sf: String = "sf0.1") =
    s"""{"n": 9, "rc": 0, "sf": 0.1, "tail": "...\\n{\\"metric\\":\\"total\\"""" +
      s""",\\"probe_sec\\":$probe,\\"probes\\":[[0,$probe],[140,0.7]]""" +
      s""",\\"mem_probes\\":[[0,$mem],[140,1.4]],\\"sf\\":\\"$sf\\"}"}"""

  // a raw bench line (the builder's own un-wrapped records)
  private def rawRec(probe: Double, mem: Double, sf: String = "sf0.1") =
    s"""{"metric":"total","probe_sec":$probe,"probes":[[0,$probe],[140,0.7]]""" +
      s""","mem_probes":[[0,$mem],[140,1.4]],"sf":"$sf"}"""

  test("windowStamp fires on a hot start probe vs the record median") {
    // lineage includes a hot artifact (1.9) — the median shrugs it off
    val prevs = Seq(rec(0.86, 1.7), rec(0.93, 1.8), rec(0.92, 1.75),
      rec(1.9, 3.8), rec(0.85, 1.7))
    // clean run: no stamp
    val (f0, w0) = Bench.windowStamp(0.88, 1.72, "sf0.1", prevs)
    assert(f0 === "" && w0.isEmpty)
    // hot run: both families displaced -> stamp + loud stderr line
    val (f1, w1) = Bench.windowStamp(1.9, 3.9, "sf0.1", prevs)
    assert(f1.startsWith(""","window_suspect":["""), f1)
    assert(w1.exists(_.contains("WINDOW-SUSPECT")))
    // one displaced family is enough (cold page cache shows scan-first)
    val (f2, _) = Bench.windowStamp(2.2, 1.7, "sf0.1", prevs)
    assert(f2.nonEmpty)
    // faster-than-median never fires (the hot PRIOR should have labeled
    // itself; symmetric firing would stamp every clean run after it)
    val (f3, _) = Bench.windowStamp(0.5, 1.0, "sf0.1", prevs)
    assert(f3 === "")
  }

  test("windowStamp compares same-sf records only and degrades to silence") {
    // a dev-loop sf0.01 run must not compare against sf0.1 records
    val (f, w) = Bench.windowStamp(9.9, 9.9, "sf0.01",
      Seq(rec(0.86, 1.7), rec(0.93, 1.8)))
    assert(f === "" && w.isEmpty)
    // no records at all -> silence, never a crash
    val (f2, _) = Bench.windowStamp(9.9, 9.9, "sf0.1", Nil)
    assert(f2 === "")
    // full-path sf tails (pre-r13 records) still match
    val (f3, _) = Bench.windowStamp(2.0, 1.7, "sf0.1",
      Seq(rec(0.86, 1.7, sf = "/root/testdata/sf0.1")))
    assert(f3.nonEmpty)
    // raw (un-wrapped) bench lines parse too — a --prev pin on the
    // builder's own record file
    val (f4, _) = Bench.windowStamp(2.0, 1.7, "sf0.1",
      Seq(rawRec(0.86, 1.7), rawRec(0.9, 1.8)))
    assert(f4.nonEmpty)
    val (f5, _) = Bench.windowStamp(0.88, 1.72, "sf0.1",
      Seq(rawRec(0.86, 1.7), rawRec(0.9, 1.8)))
    assert(f5 === "")
  }

  test("fmt2 strips trailing zeros losslessly") {
    assert(Bench.fmt2(0.5) === "0.5")
    assert(Bench.fmt2(3.0) === "3")
    assert(Bench.fmt2(12.34) === "12.34")
    assert(Bench.fmt2(0.0) === "0")
    assert(Bench.fmt2(102.29) === "102.29")
  }
}
