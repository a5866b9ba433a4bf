package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench outlier guard's prior-record parser: the guard can only
  * fire if the committed BENCH_line.json steady map round-trips. */
class BenchGuardSpec extends AnyFunSuite {

  test("priorSteady parses the committed line's queries map") {
    val dir = java.nio.file.Files.createTempDirectory("bench_guard")
    val line = """{"metric":"total_steady","value":12.5,"unit":"sec",""" +
      """"queries":{"a1_pricing":0.35,"x32_span_dedup":0.347,"x99_bad":-1.0},""" +
      """"total_cold":20.1,"reps":3,"sf":"/root/testdata/sf0.1","detail":"/x"}"""
    java.nio.file.Files.write(dir.resolve("BENCH_line.json"), line.getBytes("UTF-8"))
    val m = Bench.priorSteady(dir, "/root/testdata/sf0.1")
    assert(m == Map("a1_pricing" -> 0.35, "x32_span_dedup" -> 0.347, "x99_bad" -> -1.0))
    // a record at another scale factor is not comparable — guard stays off
    assert(Bench.priorSteady(dir, "/root/testdata/sf0.01").isEmpty)
  }

  test("priorSteady is empty on a missing or mangled record") {
    val dir = java.nio.file.Files.createTempDirectory("bench_guard_empty")
    val sf = "/root/testdata/sf0.1"
    assert(Bench.priorSteady(dir, sf).isEmpty)
    java.nio.file.Files.write(dir.resolve("BENCH_line.json"),
      "{\"metric\":\"total_steady\",\"value\":1.0}".getBytes("UTF-8"))
    assert(Bench.priorSteady(dir, sf).isEmpty)
    java.nio.file.Files.write(dir.resolve("BENCH_line.json"),
      "not json at all".getBytes("UTF-8"))
    assert(Bench.priorSteady(dir, sf).isEmpty)
  }
}
