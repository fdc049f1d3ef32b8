package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.Observation

/** Pins the Spark behavior the oversize-bucket audit must design around:
  * when a capped dedup's verified-pairs branch materializes 0 rows, AQE's
  * `AQEPropagateEmptyRelation` replaces the whole branch — including the
  * CollectMetrics audit node — and `ObservationManager.tryComplete` then
  * completes the observation with an EMPTY row. This is why the fixtures in
  * DedupSpec keep one legitimate pair alive, why `CorpusPrep.run` excludes
  * the rule for its duration, and why CorpusPrep keeps a logged fallback
  * count. If a Spark upgrade makes the AQE-on branch below start returning
  * real metrics, the exclusion and fallback can be retired. */
class ObservationPruningSpec extends SparkSpec {
  // conf-state CANARY: must run on an isolated session — a concurrent
  // suite's withReliableOversizeAudit scope on the shared session would
  // make the AQE-on phase see the exclusion and flake (observed under
  // testForkedParallel)
  override lazy val spark: org.apache.spark.sql.SparkSession =
    graft.TestSession.isolated()
  import spark.implicits._

  // all-spam corpus: every bucket oversize at cap 10 → zero verified pairs
  private def allSpam(n: Int) = {
    val toks = (0 until 8).map(j => s"tok$j")
    (0 until n).map { i =>
      (i.toLong, toks.zipWithIndex
        .flatMap { case (t, j) => Seq.fill(((i >> j) & 1) + 1)(t) }
        .mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("AQE empty propagation prunes the audit metric; excluding the rule restores it") {
    val obsOn = Observation("prune_aqe_on")
    val on = Dedup.nearDupKeepersRowwise(allSpam(40), "doc_id", "text",
      numHashes = 8, rowsPerBand = 2, threshold = 0.8,
      maxBucketSize = 10, oversizeObs = Some(obsOn)).collect()
    assert(on.length == 40)
    assert(obsOn.get.isEmpty, "AQE-pruned observation completes empty — " +
      "if this starts failing, Spark fixed metric collection under " +
      "empty propagation and the CorpusPrep rule exclusion can go")

    val key = "spark.sql.adaptive.optimizer.excludedRules"
    Dedup.withReliableOversizeAudit(spark) {
      // nesting-safe: an inner scope must not clobber the outer exclusion
      Dedup.withReliableOversizeAudit(spark)(())
      assert(spark.conf.get(key).contains("AQEPropagateEmptyRelation"),
        "inner scope exit must not remove the outer scope's exclusion")
      val obsOff = Observation("prune_aqe_off")
      val off = Dedup.nearDupKeepersRowwise(allSpam(40), "doc_id", "text",
        numHashes = 8, rowsPerBand = 2, threshold = 0.8,
        maxBucketSize = 10, oversizeObs = Some(obsOff)).collect()
      assert(off.length == 40)
      assert(obsOff.get("dropped_buckets") == 4L)
      assert(obsOff.get("dropped_members") == 160L)
    }
    assert(!spark.conf.getOption(key).exists(_.contains("AQEPropagateEmptyRelation")),
      "the helper must re-admit the rule on exit")
  }
}
