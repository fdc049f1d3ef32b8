package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-style invariants over generated corpora. ScalaCheck drives the
  * DATA generation (one fixed-seed sample per test, evaluated in a single
  * Spark job — per-case forAll would spin hundreds of jobs); the asserted
  * properties hold for every generated row. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // strings over a space-heavy alphabet: empties, runs of spaces, unicode
  private val textGen: Gen[String] = Gen.chooseNum(0, 40).flatMap { len =>
    Gen.listOfN(len, Gen.frequency(
      4 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.const('é'),
      1 -> Gen.oneOf('.', ',', '!', '-'))).map(_.mkString)
  }

  test("property: rowwise minhash == explode+agg minhash on arbitrary text") {
    val docs = sample(textGen, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val a = graft.dedup.Dedup.minhashSignature(docs, "doc_id", "text", 4,
        graft.dedup.Dedup.fastHash)
      .orderBy("doc_id").collect().map(r => (1 to 4).map(r.getLong))
    val b = graft.dedup.Dedup.minhashSignatureRowwise(docs, "doc_id", "text", 4)
      .orderBy("doc_id").collect().map(r => (1 to 4).map(r.getLong))
    assert(a.toSeq == b.toSeq)
  }

  test("property: packChunks offsets are contiguous and chunk ids consistent") {
    val budget = 64L
    val docs = sample(textGen, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = graft.trainprep.TrainPrep.packChunks(docs, "doc_id", "text", budget)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "start_offset", "chunk_id", "chunk_end_id")
      .collect()
    var expectedOffset = 0L
    rows.foreach { r =>
      val (n, start, cid, cend) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(start == expectedOffset, s"doc ${r.getLong(0)} offset gap")
      assert(cid == start / budget)
      assert(cend == math.max(start, start + n - 1) / budget)
      assert(cend >= cid)
      expectedOffset = start + n
    }
  }

  test("property: right-closed bucket contains its timestamp and aligns to step") {
    val stepNs = 900L * 1000000000L
    val tsGen = Gen.chooseNum(0L, 4102444800L * 1000000000L) // to year 2100
    val ts = sample(tsGen, 500).toDF("ns")
    val out = ts.select(col("ns"),
        TimeSeriesOps.bucketRightClosedNs(col("ns"), 900).as("bucket"))
      .collect()
    out.foreach { r =>
      val (ns, b) = (r.getLong(0), r.getLong(1))
      assert(b % stepNs == 0, "bucket label must align to the step grid")
      assert(b - ns >= 0 && b - ns < stepNs, "ts must fall in (b-step, b]")
    }
  }

  test("property: redaction output never matches the PII patterns (idempotent)") {
    val piiGen: Gen[String] = for {
      pre <- textGen
      user <- Gen.alphaNumStr.suchThat(_.nonEmpty)
      mid <- textGen
      d <- Gen.listOfN(7, Gen.numChar).map(_.mkString)
    } yield s"$pre $user@host$mid.org $mid ${d.take(3)}-${d.drop(3)}"
    val docs = sample(piiGen, 200).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = docs.select(col("doc_id"),
      graft.trainprep.TrainPrep.redactPii(col("text")).as("r1"))
    val twice = once.select(col("doc_id"),
      col("r1"), graft.trainprep.TrainPrep.redactPii(col("r1")).as("r2"))
    val rows = twice.collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2), "redaction must be idempotent")
      assert(!r.getString(1).matches(s".*${graft.trainprep.TrainPrep.PhonePattern}.*"))
      assert(!r.getString(1).matches(s".*${graft.trainprep.TrainPrep.Ipv4Pattern}.*"))
      assert(!r.getString(1).matches(s".*${graft.trainprep.TrainPrep.CardPattern}.*"))
    }
  }

  test("property: sentenceChunks conserves tokens and sentences per doc, chunks index contiguously") {
    val rnd = new scala.util.Random(37)
    val pieces = (1L to 40L).map { id =>
      val n = 1 + rnd.nextInt(12)
      id -> (0 until n).map { _ =>
        val w = 1 + rnd.nextInt(8)
        val words = Seq.fill(w)(s"w${rnd.nextInt(30)}").mkString(" ")
        // capitalize and terminate so every piece is one real sentence
        words.capitalize + (Seq(".", "!", "?")(rnd.nextInt(3)))
      }
    }.toMap
    val docs = pieces.toSeq.map { case (id, ps) => (id, ps.mkString(" ")) }
    val out = graft.trainprep.TrainPrep.sentenceChunks(
        docs.toDF("doc_id", "text"), "doc_id", "text", maxTokens = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val byDoc = out.groupBy(_._1)
    docs.foreach { case (id, text) =>
      val chunks = byDoc(id).sortBy(_._2)
      // chunk ids start at 0 and strictly increase; an over-budget
      // sentence may SKIP indices (its token mass spans >1 bucket) —
      // ordered-but-gappy is the documented contract
      val ids = chunks.map(_._2).toSeq
      assert(ids.head == 0L && ids == ids.sorted && ids.distinct == ids,
        s"doc $id chunk ids: $ids")
      // token and sentence conservation
      assert(chunks.map(_._3).sum == text.split(" ").length,
        s"doc $id token conservation")
      assert(chunks.map(_._4).sum == pieces(id).length,
        s"doc $id sentence conservation")
    }
  }

  test("property: pointInTimeJoin equals a naive per-observation interval scan") {
    val rnd = new scala.util.Random(41)
    val dimObs = (0 until 60).map { i =>
      (rnd.nextInt(3).toLong, rnd.nextInt(40).toLong, i.toLong,
        Seq("A", "B", "C")(rnd.nextInt(3)))
    }
    val obs = (0 until 80).map { i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(50).toLong, (1000 + i).toLong)
    }
    val hist = TimeSeriesOps.dimensionHistory(
      dimObs.toDF("k", "t", "id", "attr"), Seq("k"), "t", Seq("attr"),
      tiebreak = Seq("id"))
    val got = TimeSeriesOps.pointInTimeJoin(
        obs.toDF("k", "t", "oid"), hist, Seq("k"), "t")
      .select("oid", "attr")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // naive model: per key, the valid attr at time t is the attr of the
    // LATEST dim observation at or before t (ties by id)
    val byKey = dimObs.groupBy(_._1)
    obs.foreach { case (k, t, oid) =>
      val want = byKey.get(k).flatMap { os =>
        val eligible = os.filter(_._2 <= t)
        if (eligible.isEmpty) None
        else Some(eligible.maxBy(o => (o._2, o._3))._4)
      }
      assert(got(oid) == want, s"obs $oid (k=$k, t=$t): ${got(oid)} vs $want")
    }
    assert(got.size == obs.size, "row count preserved")
  }

  test("redactPii: card masks before the phone pattern can eat its dashed chunks") {
    val cases = Seq(
      (1L, "pay 4111 1111 1111 1111 now"),
      (2L, "pay 4000-1234-5678-9010 now"),
      (3L, "ip 192.168.0.1 and 17 digits 12345678901234567"),
      (4L, "call 555-1234"))
    val got = cases.toDF("id", "t")
      .select(col("id"), graft.trainprep.TrainPrep.redactPii(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "pay <CARD> now")
    assert(got(2L) === "pay <CARD> now", "dashes must not leak as <PHONE>")
    assert(got(3L) === "ip <IP> and 17 digits 12345678901234567",
      "over-long digit runs are not cards")
    assert(got(4L) === "call <PHONE>")
  }

  test("property: OHLC bars bound their observations and conserve the row count") {
    val obsGen = for {
      k <- Gen.chooseNum(0L, 3L)
      t <- Gen.chooseNum(0L, 5000L * 1000000000L)
      v <- Gen.chooseNum(-500, 500).map(_ / 10.0)
    } yield (k, t, v)
    val obs = sample(obsGen, 400).zipWithIndex
      .map { case ((k, t, v), i) => (k, t, i.toLong, v) }
    val df = obs.toDF("k", "t", "id", "v")
    val bars = TimeSeriesOps.ohlcBars(df, Seq("k"), "t", "v", stepSeconds = 900,
        tiebreak = Seq("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toMap
    bars.values.foreach { case (open, high, low, close, n) =>
      assert(low <= high && low <= open && open <= high
        && low <= close && close <= high && n > 0)
    }
    assert(bars.values.map(_._5).sum == obs.size, "every observation lands in one bar")
    // each bar's bucket is the right-closed edge of its members
    obs.foreach { case (k, t, _, _) =>
      val bucket = ((t - 1) - Math.floorMod(t - 1, 900000000000L)) + 900000000000L
      assert(bars.contains((k, bucket)), s"obs ($k, $t) must have a bar at $bucket")
    }
  }

  test("property: TWAP lies within [min, max] of the window's observations") {
    val obsGen = for {
      k <- Gen.chooseNum(0L, 2L)
      t <- Gen.chooseNum(0L, 999L)
      v <- Gen.chooseNum(-100, 100).map(_ / 4.0)
    } yield (k, t, v)
    val obs = sample(obsGen, 200).zipWithIndex
      .map { case ((k, t, v), i) => (k, t, i.toLong, v) }
    val df = obs.toDF("k", "t", "id", "v")
    val got = TimeSeriesOps.timeWeightedAvg(df, Seq("k"), "t", "v", 0L, 1000L,
        tiebreak = Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    obs.groupBy(_._1).foreach { case (k, rows) =>
      val vs = rows.map(_._4)
      assert(got(k) >= vs.min - 1e-9 && got(k) <= vs.max + 1e-9,
        s"key $k: twap ${got(k)} outside [${vs.min}, ${vs.max}]")
    }
  }

  test("property: dimensionHistory intervals tile each key's timeline with no overlap") {
    // few keys, few attr values, colliding timestamps — maximal churn
    val obsGen = for {
      k <- Gen.chooseNum(0L, 2L)
      t <- Gen.chooseNum(0L, 50L)
      a <- Gen.oneOf("A", "B", "C")
    } yield (k, t, a)
    val obs = sample(obsGen, 150).zipWithIndex
      .map { case ((k, t, a), i) => (k, t, i.toLong, a) }
    val df = obs.toDF("k", "t", "id", "attr")
    // output columns: k, effective_from, attr, version, effective_to
    val hist = TimeSeriesOps.dimensionHistory(df, Seq("k"), "t", Seq("attr"),
        tiebreak = Seq("id"))
      .collect().map(r => (r.getLong(0),
        r.getLong(1), // effective_from
        if (r.isNullAt(4)) None else Some(r.getLong(4)), // effective_to
        r.getString(2), r.getLong(3)))
    hist.groupBy(_._1).foreach { case (k, versionsArr) =>
      val sorted = versionsArr.toSeq.sortBy(_._5) // version order = lead ordering
      // exactly one open interval per key, and it is the LAST one
      assert(sorted.init.forall(_._3.nonEmpty) && sorted.last._3.isEmpty,
        s"key $k: $sorted")
      // each interval ends where the next begins (half-open tiling)...
      sorted.sliding(2).foreach {
        case Seq((_, _, Some(to), _, _), (_, from2, _, _, _)) =>
          assert(to == from2, s"key $k: gap/overlap at $to vs $from2")
        case _ => ()
      }
      // ...consecutive versions really differ, and the first spans the
      // key's earliest observation
      sorted.sliding(2).foreach {
        case Seq((_, _, _, a1, _), (_, _, _, a2, _)) =>
          assert(a1 != a2, s"key $k: spurious version with unchanged attr $a1")
        case _ => ()
      }
      val tMin = obs.filter(_._1 == k).map(_._2).min
      assert(sorted.head._2 == tMin, s"key $k: first interval must open at $tMin")
    }
  }

  test("property: ROC AUC is a rank statistic — invariant under monotone score transforms") {
    // generated scores with deliberate ties, labels from an independent gen
    val rows = sample(Gen.zip(Gen.chooseNum(0, 30), Gen.oneOf(true, false)), 400)
      .map { case (s, y) => (s / 10.0, y) }
    val df = rows.toDF("s", "y")
    val base = graft.eval.EvalMetrics.rocAuc(df, "y", "s").head().getDouble(2)
    // strictly monotone transforms preserve every pairwise order AND every
    // tie group, so the Mann-Whitney statistic must not move at all
    val stretched = rows.map { case (s, y) => (s * 17.0 - 3.0, y) }.toDF("s", "y")
    val exped = rows.map { case (s, y) => (math.exp(s), y) }.toDF("s", "y")
    assert(graft.eval.EvalMetrics.rocAuc(stretched, "y", "s").head().getDouble(2) === base)
    assert(graft.eval.EvalMetrics.rocAuc(exped, "y", "s").head().getDouble(2) === base)
    assert(base >= 0.0 && base <= 1.0)
    // label inversion reflects the statistic around 1/2 (tie mass is
    // symmetric): AUC_pos + AUC_neg == 1 exactly in the rank identity
    val flipped = rows.map { case (s, y) => (s, !y) }.toDF("s", "y")
    val inv = graft.eval.EvalMetrics.rocAuc(flipped, "y", "s").head().getDouble(2)
    assert(math.abs(base + inv - 1.0) < 2e-6, s"$base + $inv != 1")
  }

  test("property: PR sweep books always balance and move monotonically") {
    val rows = sample(Gen.zip(Gen.chooseNum(0, 50), Gen.oneOf(true, false)), 500)
      .map { case (s, y) => (s / 25.0, y) }
    val df = rows.toDF("s", "y")
    val p = rows.count(_._2).toLong
    val sweep = graft.eval.EvalMetrics.prSweep(df, "y", "s")
      .orderBy(col("threshold").desc).collect()
    var (prevTp, prevPp) = (0L, 0L)
    sweep.foreach { r =>
      val (tp, fp, fn) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tp + fn == p, "tp + fn must always equal total positives")
      assert(tp >= prevTp && tp + fp >= prevPp,
        "cumulatives must be monotone down the threshold axis")
      prevTp = tp; prevPp = tp + fp
    }
    assert(prevTp == p && prevPp == rows.length,
      "the floor threshold must predict everything positive")
    // threshold axis covers every distinct score exactly once
    assert(sweep.length == rows.map(_._1).distinct.length)
  }

  test("property: retrieval metrics bounds and perfect-run fixed points") {
    val qrels = (1L to 5L).flatMap(q => (1 to 4).map(d => (q, s"d$d", 1)))
      .toDF("q", "d", "g")
    // the run that IS the ideal ranking scores 1.0 on every metric
    val perfect = (1L to 5L).flatMap(q =>
      (1 to 4).map(d => (q, s"d$d", 1.0 - d / 10.0))).toDF("q", "d", "s")
    val m = graft.eval.EvalMetrics.retrievalMetrics(
      perfect, qrels, "q", "d", "s", "g", k = 4).collect()
    m.foreach { r =>
      assert(r.getDouble(3) === 1.0 && r.getDouble(4) === 1.0 &&
        r.getDouble(5) === 1.0 && r.getDouble(6) === 1.0, r.toString)
    }
    // generated noisy runs stay within [0, 1] on every metric
    val noisy = sample(Gen.zip(Gen.chooseNum(1L, 5L),
        Gen.chooseNum(1, 30), Gen.chooseNum(0, 100)), 400)
      .map { case (q, d, s) => (q, s"d$d", s / 100.0) }
      .toDF("q", "d", "s").distinct()
    val nm = graft.eval.EvalMetrics.retrievalMetrics(
      noisy, qrels, "q", "d", "s", "g", k = 4).collect()
    nm.foreach { r =>
      (3 to 6).foreach { i =>
        assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0, r.toString)
      }
    }
  }
}
