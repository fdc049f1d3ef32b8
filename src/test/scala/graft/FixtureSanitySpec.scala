package graft

/** Hard gate on testdata drift: if the producer changes a logical type the
  * engine depends on (round 9: events.ts nanos→micros), this fails with the
  * exact (table, column, observed, accepted) line instead of 24 queries
  * exploding downstream. */
class FixtureSanitySpec extends SparkSpec {
  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"/root/testdata/$sf matches the expected logical types") {
      val dir = s"/root/testdata/$sf"
      assume(new java.io.File(dir).isDirectory, s"$dir absent on this machine")
      val bad = FixtureSanity.anomalies(spark, dir)
      assert(bad.isEmpty, "fixture drift:\n" + bad.mkString("\n"))
    }
  }
}
