package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deep scale validation of the two heaviest dedup/selection stages at
  * 1 M+ docs (10× the ScaleSmoke corpus) — `sbt "runMain graft.ScaleDeep"`.
  *
  * The corpus is SYNTHETIC-UNIQUE, not replicated: ScaleSmoke's 20×
  * replication is right for keeper pipelines (exact-digest collapse eats
  * the clones first) but wrong for containment, where a 200-clone group
  * would make every posting a clique. Here doc i is 40 pseudo-random
  * tokens keyed by hash(seed, j) over a 50 k-word vocabulary — shingles
  * are effectively unique — and every 4th doc is a PLANTED true-prefix
  * sub-document of its predecessor (20 tokens, containment 1.0), so the
  * candidate population is known by construction: ~250 k true pairs in
  * 1 M docs, and the expected survivor count is exact (subs drop, all
  * else survives).
  *
  * What is measured per section, via a stage-completion listener:
  * shuffle RECORDS and bytes written (the rows-shuffled evidence the
  * README table quotes), peak single-stage bytes, wall seconds. The
  * claims under test:
  *
  *  - containmentDrop shuffles O(posting entries + candidate pairs)
  *    rows — a small constant × the 38 M shingle occurrences, never
  *    docs × docs and never text bodies (records × ~24 B ≈ bytes);
  *  - dsirSelect shuffles O(vocabulary × partitions + docs) rows — the
  *    ~318 M exploded character trigrams collapse in map-side partial
  *    aggregation (char-trigram vocab here is ~10³), so shuffled records
  *    sit ORDERS below trigram occurrences.
  */
object ScaleDeep {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    val shuffleRecs = new java.util.concurrent.atomic.AtomicLong()
    val peakStage = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics.shuffleWriteMetrics
        shuffleBytes.addAndGet(m.bytesWritten)
        shuffleRecs.addAndGet(m.recordsWritten)
        peakStage.updateAndGet(p => math.max(p, m.bytesWritten))
      }
    })
    def section[T](f: => T): (T, Long, Long, Long, Double) = {
      Thread.sleep(400)
      val b0 = shuffleBytes.get(); val r0 = shuffleRecs.get()
      peakStage.set(0L)
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      (r, shuffleRecs.get() - r0, shuffleBytes.get() - b0, peakStage.get(), secs)
    }

    val nDocs = 1000000L * mult
    val vocab = 50000
    val supTokens = 40
    val subTokens = 20
    // doc i: every 4th doc (i % 4 == 1) reuses its predecessor's seed and
    // takes only the first `subTokens` tokens — a true-prefix sub-document
    val docs = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(4)) === 1, col("id") - 1).otherwise(col("id"))
          .as("seed"),
        when(pmod(col("id"), lit(4)) === 1, lit(subTokens)).otherwise(lit(supTokens))
          .as("len"))
      .select(col("doc_id"), concat_ws(" ",
        transform(sequence(lit(1), col("len")),
          j => concat(lit("w"), pmod(hash(col("seed"), j), lit(vocab))
            .cast("string")))).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val built = docs.count()
    val expectedSubs = (1L until nDocs).count(_ % 4 == 1) // planted sub-docs

    // ---- containmentDrop at 1 M docs --------------------------------------
    val obs = org.apache.spark.sql.Observation("scale_deep_posting")
    val (survivors, cRecs, cBytes, cPeak, cSecs) = section {
      graft.dedup.Dedup.containmentDrop(docs, "doc_id", "text",
        threshold = 0.9, shingleTokens = 3, oversizeObs = Some(obs)).count()
    }
    val postings = obs.get
    println(s"""{"metric":"containment_drop_1m","docs":$built,""" +
      s""""planted_subs":$expectedSubs,"survivors":$survivors,""" +
      s""""shuffle_records":$cRecs,"shuffle_mb":${cBytes / 1000000},""" +
      s""""peak_stage_mb":${cPeak / 1000000},"seconds":$cSecs,""" +
      s""""dropped_postings":${postings("dropped_buckets")},""" +
      s""""max_posting":${postings("max_bucket")}}""")
    require(survivors == built - expectedSubs,
      s"expected ${built - expectedSubs} survivors (all but planted subs), got $survivors")
    // rows-shuffled bound: postings ≈ docs×(tokens−2) flow through a
    // bounded number of exchanges; 6× covers dfreq + posting join +
    // prefix window + candidate join + two verify joins with headroom
    val shingleOccurrences = (nDocs / 4) * 3 * (supTokens - 2) +
      (nDocs / 4) * (subTokens - 2)
    require(cRecs < 6L * shingleOccurrences,
      s"containment shuffled $cRecs records — more than 6x the " +
        s"$shingleOccurrences posting entries; a doc×doc or text-bearing " +
        "shuffle has crept in")

    // ---- dsirSelect at 1 M docs -------------------------------------------
    val target = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val (top, dRecs, dBytes, dPeak, dSecs) = section {
      graft.trainprep.TrainPrep.dsirSelect(docs, target, "doc_id", "text",
        k = 1000).count()
    }
    println(s"""{"metric":"dsir_select_1m","docs":$built,""" +
      s""""target_docs":${nDocs / 97 + 1},"selected":$top,""" +
      s""""shuffle_records":$dRecs,"shuffle_mb":${dBytes / 1000000},""" +
      s""""peak_stage_mb":${dPeak / 1000000},"seconds":$dSecs}""")
    require(top == 1000L, s"dsirSelect must return k rows, got $top")
    // the raw corpus explodes to ~docs×(chars−2) trigram rows; partial
    // aggregation must collapse them BEFORE the exchange — shuffled
    // records may scale with docs (per-doc score partials) but never with
    // trigram occurrences
    val trigramOccurrences = nDocs * 200L // conservative lower bound
    require(dRecs < trigramOccurrences / 10,
      s"dsirSelect shuffled $dRecs records — within 10x of the raw " +
        s"trigram stream (~$trigramOccurrences); map-side collapse is broken")

    docs.unpersist()
    spark.stop()
  }
}
