package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property tests for the relational middle layer — SURVEY.md §5 strategy 3:
  * resample-sum conservation, cumulative-fraction shape, bucket edges.
  * Cases come from a fixed-seed generator so failures reproduce exactly. */
class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  /** Deterministic random 5-min-grid series: (time, value>=0). */
  private def randomSeries(seed: Int): Seq[(Timestamp, Double)] = {
    val rnd = new scala.util.Random(seed)
    val n = 1 + rnd.nextInt(40)
    Seq.fill(n)((1 + rnd.nextInt(200)) * 5)
      .distinct
      .map(m => (new Timestamp(base + m * 60000L), rnd.nextInt(4000) / 100.0))
  }

  test("A2 conservation: 15-min right-closed resample preserves the total sum") {
    (1 to 15).foreach { seed =>
      val df = randomSeries(seed).toDF("time", "value")
      val resampled = TimeSeriesOps.resampleRightClosedSum(df, 900)
      val before = df.agg(sum("value")).head.getDouble(0)
      val after = resampled.agg(sum("value")).head.getDouble(0)
      assert(math.abs(before - after) < 1e-9, s"seed=$seed")
    }
  }

  test("A2 alignment: every point lands in the right-closed bucket ending at/after it") {
    (1 to 10).foreach { seed =>
      val df = randomSeries(seed).toDF("time", "value")
      val buckets = df.select(col("time"),
        TimeSeriesOps.bucketRightClosedTs(col("time"), 900).as("bucket"))
        .collect()
      buckets.foreach { r =>
        val t = r.getTimestamp(0).getTime
        val b = r.getTimestamp(1).getTime
        assert(b >= t, "bucket label must be at/after the point (right-closed)")
        assert(b - t < 900000L, "point must be within one step of its label")
        assert((b - base) % 900000L === 0L, "labels sit on the 15-min grid")
      }
    }
  }

  test("A2 right-closed edge: a point exactly on a boundary labels ITS bucket, not the next") {
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 00:15:00"), 1.0),
      (Timestamp.valueOf("2024-01-01 00:15:00.000001"), 2.0)
    ).toDF("time", "value")
    val out = TimeSeriesOps.resampleRightClosedSum(df, 900)
      .orderBy("time").collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(1)))
    assert(out === Array(
      ("2024-01-01 00:15:00.0", 1.0),   // boundary point → (00:00, 00:15]
      ("2024-01-01 00:30:00.0", 2.0)))  // 1 µs past → (00:15, 00:30]
  }

  test("A5 shape: cumulative fraction is monotone in [0,1]; last == 1 when total > 0") {
    (1 to 10).foreach { seed =>
      val pts = randomSeries(seed)
      val fr = TimeSeriesOps.normalizedCumulative(pts.toDF("time", "value"))
        .orderBy("time").select("frac").collect().map(_.getDouble(0))
      assert(fr.forall(f => f >= -1e-12 && f <= 1 + 1e-12), s"seed=$seed")
      assert(fr.sliding(2).forall { case Array(a, b) => b >= a - 1e-12; case _ => true },
        s"seed=$seed monotone")
      val total = pts.map(_._2).sum
      if (total > 0) assert(math.abs(fr.last - 1.0) < 1e-9, s"seed=$seed")
      else assert(fr.forall(_ == 0.0), s"seed=$seed")
    }
  }

  test("W1 anchor: elapsed hours are 0 for the first point, per series key") {
    val df = Seq(
      ("a", Timestamp.valueOf("2024-01-01 02:00:00"), 1.0),
      ("a", Timestamp.valueOf("2024-01-01 04:30:00"), 2.0),
      ("b", Timestamp.valueOf("2024-01-01 10:00:00"), 3.0)
    ).toDF("id", "time", "value")
    val out = TimeSeriesOps.anchorElapsedHours(df, keys = Seq("id"))
      .orderBy("id", "time").select("elapsed_h").collect().map(_.getDouble(0))
    assert(out === Array(0.0, 2.5, 0.0))
  }

  test("F5: negatives dropped, zeros kept") {
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), -0.1),
      (Timestamp.valueOf("2024-01-01 00:05:00"), 0.0)
    ).toDF("time", "value")
    assert(TimeSeriesOps.dropNegatives(df).count() === 1)
  }

  test("asofJoin picks the latest right value at/before each left time, per key") {
    val trades = Seq(
      ("a", Timestamp.valueOf("2024-01-01 00:10:00"), 100.0),
      ("a", Timestamp.valueOf("2024-01-01 00:30:00"), 200.0),
      ("b", Timestamp.valueOf("2024-01-01 00:05:00"), 300.0)
    ).toDF("id", "time", "qty")
    val quotes = Seq(
      ("a", Timestamp.valueOf("2024-01-01 00:10:00"), 1.5), // tie → visible
      ("a", Timestamp.valueOf("2024-01-01 00:20:00"), 2.5),
      ("b", Timestamp.valueOf("2024-01-01 00:06:00"), 9.9)  // after left row
    ).toDF("id", "time", "px")
    val out = TimeSeriesOps.asofJoin(trades, quotes, Seq("id"))
      .orderBy("id", "time")
      .collect().map(r => (r.getString(0), r.getDouble(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out === Array(
      ("a", 100.0, Some(1.5)),
      ("a", 200.0, Some(2.5)),
      ("b", 300.0, None))) // no quote at/before 00:05
  }

  test("scanCumSumLong == sequential global window, for any partition count") {
    val rnd = new scala.util.Random(7)
    // duplicate keys included: (k, id) is the total order, values span sign
    val rows = (0 until 500).map { i =>
      (rnd.nextInt(80).toLong, i.toLong, rnd.nextInt(20001) - 10000L)
    }
    val df = rows.toDF("k", "id", "v")
    val expected = rows.sortBy(r => (r._1, r._2))
      .scanLeft(0L)(_ + _._3).drop(1)
    Seq(1, 3, 8, 64).foreach { n =>
      val got = TimeSeriesOps.scanCumSumLong(df, Seq("k", "id"), "v", "cum", n)
        .orderBy("k", "id").select("cum").collect().map(_.getLong(0)).toSeq
      assert(got === expected, s"numParts=$n")
    }
  }

  test("interpolateGaps: interior NULL runs lerp; edges stay NULL; per-key isolation") {
    val df = Seq(
      // key a: values at t=0 (10.0) and t=10 (20.0); gaps at 2, 5
      ("a", 0L, 1L, Some(10.0)), ("a", 2L, 2L, None), ("a", 5L, 3L, None),
      ("a", 10L, 4L, Some(20.0)),
      // leading and trailing gaps
      ("a", -5L, 0L, None), ("a", 15L, 5L, None),
      // key b must not see key a's neighbors
      ("b", 3L, 6L, None)
    ).map { case (k, t, id, v) => (k, t, id, v.map(Double.box).orNull) }
      .toDF("k", "t", "id", "v")
    val got = TimeSeriesOps.interpolateGaps(df, Seq("k"), "t", "v", tiebreak = Seq("id"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got(("a", 0L)) == Some(10.0) && got(("a", 10L)) == Some(20.0))
    assert(got(("a", 2L)) == Some(12.0))  // 10 + (20-10) * 2/10
    assert(got(("a", 5L)) == Some(15.0))
    assert(got(("a", -5L)).isEmpty && got(("a", 15L)).isEmpty, "edge gaps stay NULL")
    assert(got(("b", 3L)).isEmpty, "no cross-key interpolation")
  }

  test("interpolateGaps: a null between duplicate timestamps takes the previous value") {
    val df = Seq(
      ("a", 1L, 1L, Some(5.0)), ("a", 1L, 2L, None), ("a", 1L, 3L, Some(9.0)))
      .map { case (k, t, id, v) => (k, t, id, v.map(Double.box).orNull) }
      .toDF("k", "t", "id", "v")
    val got = TimeSeriesOps.interpolateGaps(df, Seq("k"), "t", "v", tiebreak = Seq("id"))
      .filter(col("id") === 2L).head
    assert(got.getDouble(4) == 5.0, "0/0 guard: same-ts neighbors short-circuit to prev")
  }

  test("rollingZScore matches a local model and excludes the current row") {
    val vals = Seq(10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 10.05, 50.0, 10.1, 9.95)
    val df = vals.zipWithIndex.map { case (v, i) => ("a", i.toLong, i.toLong, v) }
      .toDF("k", "t", "id", "v")
    val got = TimeSeriesOps.rollingZScore(df, Seq("k"), "t", "v",
        lookback = 5, minObs = 3, tiebreak = Seq("id"))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    // local model on the same fixed-point integers
    def z(i: Int): Option[Double] = {
      val lo = math.max(0, i - 5)
      val win = vals.slice(lo, i).map(v => math.round(v * 1000))
      val n = win.size
      if (n < 3) None else {
        val s1 = win.sum; val s2 = win.map(x => x * x).sum
        val varNum = (n.toLong * s2 - s1 * s1).toDouble
        if (varNum <= 0) None else {
          val sd = math.sqrt(varNum / (n.toLong * (n - 1)).toDouble)
          Some((math.round(vals(i) * 1000).toDouble - s1.toDouble / n) / sd)
        }
      }
    }
    vals.indices.foreach { i =>
      (got(i.toLong), z(i)) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12, s"i=$i: $a vs $b")
        case (a, b) => assert(a == b, s"i=$i: $a vs $b")
      }
    }
    assert(got(0L).isEmpty && got(2L).isEmpty, "below minObs stays NULL")
    assert(got(7L).exists(_ > 3.0), "the planted spike flags")
    assert(got(8L).isDefined, "the row after the spike is scored against a window containing it")
  }

  test("rollingZScore: zero-variance window yields NULL, not Infinity") {
    val df = (0 until 8).map(i => ("a", i.toLong, i.toLong, 5.0)).toDF("k", "t", "id", "v")
    val got = TimeSeriesOps.rollingZScore(df, Seq("k"), "t", "v",
        lookback = 5, minObs = 3, tiebreak = Seq("id"))
      .collect()
    assert(got.forall(_.isNullAt(4)))
  }

  test("dimensionHistory: changes version, re-observations collapse, intervals abut") {
    val obs = Seq(
      ("u1", 10L, 1L, "A"), ("u1", 20L, 2L, "A"),  // re-observation: no new version
      ("u1", 30L, 3L, "B"),                        // change
      ("u1", 40L, 4L, "A"),                        // change back = NEW version
      ("u2", 15L, 5L, "X"))
      .toDF("k", "t", "id", "attr")
    val got = TimeSeriesOps.dimensionHistory(obs, Seq("k"), "t", Seq("attr"),
        tiebreak = Seq("id"))
      .collect().map(r => (r.getString(0), r.getLong(3)) ->
        (r.getLong(1), r.getString(2), if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toMap
    assert(got(("u1", 1L)) == (10L, "A", Some(30L)))
    assert(got(("u1", 2L)) == (30L, "B", Some(40L)))
    assert(got(("u1", 3L)) == (40L, "A", None), "current version is open-ended")
    assert(got(("u2", 1L)) == (15L, "X", None))
    assert(got.size == 4)
  }

  test("timeWeightedAvg: hold-until-next weighting, last segment holds to the window end") {
    // key a: v=10 holds [0,6), v=40 holds [6,10) -> twap = (10*6+40*4)/10 = 22
    val df = Seq(("a", 0L, 1L, 10.0), ("a", 6L, 2L, 40.0),
      ("b", 5L, 3L, 7.0)) // single obs holds the whole tail [5,10)
      .toDF("k", "t", "id", "v")
    val got = TimeSeriesOps.timeWeightedAvg(df, Seq("k"), "t", "v", 0L, 10L,
        tiebreak = Seq("id"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") == 22.0)
    assert(got("b") == 7.0)
    // chatty-period control: plain avg of a's values would be 25, not 22
  }

  test("timeWeightedAvg: observations outside [from, to) are excluded") {
    val df = Seq(("a", -5L, 1L, 100.0), ("a", 2L, 2L, 10.0), ("a", 15L, 3L, 100.0))
      .toDF("k", "t", "id", "v")
    val got = TimeSeriesOps.timeWeightedAvg(df, Seq("k"), "t", "v", 0L, 10L)
      .head
    assert(got.getDouble(1) == 10.0 && got.getLong(2) == 1L)
  }

  test("ohlcBars: open/close pick the boundary rows, deterministic under duplicate ts") {
    val df = Seq(
      ("a", 100L, 1L, 5.0), ("a", 100L, 2L, 9.0), // same ts: id orders them
      ("a", 200L, 3L, 1.0), ("a", 300L, 4L, 7.0))
      .toDF("k", "t", "id", "v")
    val got = TimeSeriesOps.ohlcBars(df, Seq("k"), "t", "v", stepSeconds = 1,
        tiebreak = Seq("id"))
      .head
    // all rows land in one 1s bucket (ts are sub-second ns)
    assert(got.getDouble(2) == 5.0, "open = earliest (ts, id)")
    assert(got.getDouble(3) == 9.0 && got.getDouble(4) == 1.0)
    assert(got.getDouble(5) == 7.0, "close = latest (ts, id)")
    assert(got.getLong(6) == 4L)
  }

  test("ohlcBars: NaN observations drop up front — high not poisoned, n_obs excludes them") {
    // Spark's total order sorts NaN greatest: before the guard, a NaN row
    // poisoned `high` (plain max) but not low/open/close (min / min_by)
    val df = Seq(
      ("a", 100L, 1L, 2.0), ("a", 200L, 2L, Double.NaN), ("a", 300L, 3L, 8.0))
      .toDF("k", "t", "id", "v")
    val got = TimeSeriesOps.ohlcBars(df, Seq("k"), "t", "v", stepSeconds = 1,
        tiebreak = Seq("id"))
      .head
    assert(got.getDouble(2) == 2.0 && got.getDouble(3) == 8.0
      && got.getDouble(4) == 2.0 && got.getDouble(5) == 8.0)
    assert(got.getLong(6) == 2L, "the NaN row must not count toward n_obs")
  }

  test("pointInTimeJoin: each observation takes the version valid at its time; pre-history is NULL") {
    val dimObs = Seq(
      ("u", 10L, 1L, "A"), ("u", 20L, 2L, "B"), ("u", 30L, 3L, "C"),
      ("v", 15L, 4L, "X"))
      .toDF("k", "t", "id", "attr")
    val hist = TimeSeriesOps.dimensionHistory(dimObs, Seq("k"), "t",
      Seq("attr"), tiebreak = Seq("id"))
    val obs = Seq(
      ("u", 5L, 100L),  // before u's first interval → NULL
      ("u", 10L, 101L), // exactly at a version start
      ("u", 25L, 102L), // mid-interval
      ("u", 99L, 103L), // open (current) interval
      ("v", 15L, 104L), // single-version key
      ("w", 50L, 105L)  // unknown key → NULL
    ).toDF("k", "t", "oid")
    val got = TimeSeriesOps.pointInTimeJoin(obs, hist, Seq("k"), "t")
      .select("oid", "attr", "version")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    assert(got === Map(
      100L -> ((None, -1L)), 101L -> ((Some("A"), 1L)),
      102L -> ((Some("B"), 2L)), 103L -> ((Some("C"), 3L)),
      104L -> ((Some("X"), 1L)), 105L -> ((None, -1L))))
    // at most one version per observation: row count is preserved
    assert(TimeSeriesOps.pointInTimeJoin(obs, hist, Seq("k"), "t").count() == 6L)
  }

  test("dimensionHistory: versions sharing a timestamp keep the open interval on the NEWEST") {
    // two changes at the same ts: the tiebreak (id) orders them; the lead
    // window must order by (from, version) or the open interval could land
    // on the stale version
    val obs = Seq(("u", 10L, 1L, "A"), ("u", 10L, 2L, "B"))
      .toDF("k", "t", "id", "attr")
    val got = TimeSeriesOps.dimensionHistory(obs, Seq("k"), "t", Seq("attr"),
        tiebreak = Seq("id"))
      .collect().map(r => r.getLong(3) ->
        (r.getString(2), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(got(1L) == ("A", Some(10L)), "stale version closes")
    assert(got(2L) == ("B", None), "newest version stays open")
  }

  test("rollingZScore fails loudly outside the exact fixed-point domain") {
    val df = Seq(("a", 1L, 1L, 1.0e7), ("a", 2L, 2L, 2.0e7), ("a", 3L, 3L, 3.0e7))
      .toDF("k", "t", "id", "v")
    val ex = intercept[Exception] {
      TimeSeriesOps.rollingZScore(df, Seq("k"), "t", "v",
        lookback = 5, minObs = 2, tiebreak = Seq("id")).collect()
    }
    assert(ex.getMessage.contains("exact fixed-point domain")
      || String.valueOf(ex.getCause).contains("exact fixed-point domain"), ex.getMessage)
  }

  test("dimensionHistory: NULL attribute values compare null-safely") {
    val obs = Seq(("u", 1L, 1L, null), ("u", 2L, 2L, null), ("u", 3L, 3L, "A"))
      .asInstanceOf[Seq[(String, Long, Long, String)]]
      .toDF("k", "t", "id", "attr")
    val got = TimeSeriesOps.dimensionHistory(obs, Seq("k"), "t", Seq("attr"),
        tiebreak = Seq("id")).collect()
    assert(got.length == 2, "two NULL observations collapse into one version")
  }

  test("X14: series hash id is 64 hex chars and deterministic") {
    val ids = spark.range(2).select(
      TimeSeriesOps.seriesHashId(lit("flo2d_250"), lit("MME"), lit("cell_1")).as("h"))
      .collect().map(_.getString(0))
    assert(ids(0) === ids(1))
    assert(ids(0).matches("[0-9a-f]{64}"))
  }

  test("forecastSkill: hand scores, mean-forecast baseline, constant-obs NULL") {
    // series A: obs (1, 2, 3), fcst (1, 2, 3) -> perfect: errors 0, NSE 1
    // series B: obs (1, 3), fcst (3, 1) -> e = (2, -2): MAE 2, RMSE 2,
    //   bias 0, NSE = 1 - 8/2 = -3 (worse than the mean forecast)
    // series C: constant obs -> zero variance, NSE NULL
    val obs = Seq(("A", 1L, 1.0), ("A", 2L, 2.0), ("A", 3L, 3.0),
      ("B", 1L, 1.0), ("B", 2L, 3.0), ("C", 1L, 5.0), ("C", 2L, 5.0))
      .toDF("k", "t", "o")
    val fcst = Seq(("A", 1L, 1.0), ("A", 2L, 2.0), ("A", 3L, 3.0),
      ("B", 1L, 3.0), ("B", 2L, 1.0), ("C", 1L, 4.0), ("C", 2L, 6.0))
      .toDF("k", "t", "f")
    val got = TimeSeriesOps.forecastSkill(fcst, obs, Seq("k"), "t", "f", "o")
      .orderBy("k").collect()
    assert(got(0).getLong(1) === 3L)
    assert((2 to 5).forall(i => got(0).getDouble(i) == (if (i == 5) 1.0 else 0.0)),
      got(0).toString)
    assert(got(1).getDouble(2) === 2.0 && got(1).getDouble(3) === 2.0)
    assert(got(1).getDouble(4) === 0.0 && got(1).getDouble(5) === -3.0)
    assert(got(2).isNullAt(5), "constant observations have undefined skill")
  }
}
