package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** K4 run_meta.json merge: map union, last-writer-wins (reference:
  * input/raincell/gen_raincell.py:17-32). */
class RunMetaJsonSpec extends AnyFunSuite {

  test("merge creates, unions, and overwrites keys last-writer-wins") {
    val path = Files.createTempDirectory("meta").resolve("run_meta.json").toString
    assert(RunMetaJson.merge(path, Map("RAINCELL" -> "2024-01-01 00:00:00")) ===
      Map("RAINCELL" -> "2024-01-01 00:00:00"))
    val m2 = RunMetaJson.merge(path, Map("INFLOW" -> "x", "RAINCELL" -> "2024-01-02 00:00:00"))
    assert(m2 === Map("RAINCELL" -> "2024-01-02 00:00:00", "INFLOW" -> "x"))
    // round-trips through the file
    assert(RunMetaJson.merge(path, Map.empty) === m2)
  }

  test("escapes and round-trips control/quote characters") {
    val path = Files.createTempDirectory("meta").resolve("run_meta.json").toString
    val tricky = Map("k\"1" -> "a\nb\tc\\d", "k2" -> "x")
    assert(RunMetaJson.merge(path, tricky) === tricky)
    assert(RunMetaJson.merge(path, Map.empty) === tricky)
  }
}
