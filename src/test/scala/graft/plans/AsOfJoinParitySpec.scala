package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TimeSeriesOps

/** The native AsOfJoinExec (custom LogicalPlan + Strategy + SparkPlan) must
  * be EXACTLY the union+window asofJoin under every fixture shape — the
  * operator is an execution-strategy change, never a semantics change. */
class AsOfJoinParitySpec extends SparkSpec {
  import spark.implicits._

  private def randomFixture(seed: Int): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) = {
    val rnd = new scala.util.Random(seed)
    val keys = 1 to 4
    val left = for {
      k <- keys; i <- 1 to 20
    } yield (k.toLong, rnd.nextInt(1000).toLong, s"l$k-$i")
    val right = for {
      k <- keys.filter(_ != 4) // key 4 has no right rows at all
      i <- 1 to 10
    } yield (k.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100).toDouble)
    (left.toDF("k", "time", "tag"),
      right.toDF("k", "time", "v").repartition(3))
  }

  private def collectSorted(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "time", "tag", "asof_v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sortBy(t => (t._1, t._2, t._3))

  test("mismatched key types between sides are rejected, not silently mis-joined") {
    // IntegerType vs LongType keys hash-partition differently AND compare
    // through the left-typed natural ordering — either alone silently
    // drops matches, so the exec must refuse at execution time
    val l = Seq((1, 10L, "x")).toDF("k", "time", "tag") // k: Int
    val r = Seq((1L, 5L, 2.0)).toDF("k", "time", "v")   // k: Long
    val ex = intercept[Exception] {
      TimeSeriesOps.asofJoinNative(l, r, Seq("k"), "time").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      String.valueOf(c.getMessage).contains("key column types must match")),
      s"unexpected failure: $ex")
  }

  test("native as-of join equals the union+window form on random fixtures") {
    (1 to 5).foreach { seed =>
      val (l, r) = randomFixture(seed)
      val window = collectSorted(TimeSeriesOps.asofJoin(l, r, Seq("k"), "time"))
      val native = collectSorted(
        TimeSeriesOps.asofJoinNative(l, r, Seq("k"), "time", rightTiebreak = Seq("v")))
      assert(native.sameElements(window), s"seed=$seed")
    }
  }

  test("plan contains AsOfJoinExec with one exchange per side, no window") {
    val (l, r) = randomFixture(7)
    val df = TimeSeriesOps.asofJoinNative(l, r, Seq("k"), "time")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("AsOfJoin "), plan.take(800)) // nodeName drops Exec
    assert(!plan.contains("Window"), "the native form must not window:\n" + plan.take(800))
    // exactly one ENSURE_REQUIREMENTS exchange per side (the fixture's own
    // repartition(3) shows as a REPARTITION exchange and doesn't count)
    assert("ENSURE_REQUIREMENTS".r.findAllIn(plan).length == 2,
      "one hash exchange per side:\n" + plan.take(1200))
  }

  test("ties at equal time: right row at left's exact time IS visible (<= semantics)") {
    val l = Seq((1L, 100L, "a")).toDF("k", "time", "tag")
    val r = Seq((1L, 100L, 5.0), (1L, 99L, 4.0)).toDF("k", "time", "v")
    val got = TimeSeriesOps.asofJoinNative(l, r, Seq("k"), "time")
      .head.getDouble(3)
    assert(got == 5.0)
  }

  test("a left key with no right rows yields NULL asof columns") {
    val l = Seq((9L, 100L, "a")).toDF("k", "time", "tag")
    val r = Seq((1L, 50L, 4.0)).toDF("k", "time", "v")
    val row = TimeSeriesOps.asofJoinNative(l, r, Seq("k"), "time").head
    assert(row.isNullAt(3))
  }

  test("duplicate right (key, time) rows resolve to the tiebreak maximum") {
    val l = Seq((1L, 100L, "a")).toDF("k", "time", "tag")
    val r = Seq((1L, 90L, 2.0), (1L, 90L, 7.0), (1L, 90L, 5.0)).toDF("k", "time", "v")
    val got = TimeSeriesOps.asofJoinNative(l, r, Seq("k"), "time",
      rightTiebreak = Seq("v")).head.getDouble(3)
    assert(got == 7.0, "last under (time, v) ascending = max v — the window form's rule")
    // the DEFAULT tiebreak (all orderable right value columns) applies the
    // same rule — no caller gets shuffle-arrival nondeterminism by omission
    val dflt = TimeSeriesOps.asofJoinNative(l, r.repartition(3), Seq("k"), "time")
      .head.getDouble(3)
    assert(dflt == 7.0, "default tiebreak must match the window form's max rule")
  }

  test("NULL left time sees no finite-time right row; NULL right time is always eligible") {
    val l = Seq((1L, Some(100L), "at100"), (1L, None, "atNull"))
      .map { case (k, t, tag) => (k, t.map(Long.box).orNull, tag) }
      .toDF("k", "time", "tag")
    val r = Seq((1L, 50L, 4.0)).toDF("k", "time", "v")
    val got = TimeSeriesOps.asofJoinNative(l, r, Seq("k"), "time")
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got("at100") == Some(4.0))
    assert(got("atNull").isEmpty,
      "a null-time left row sorts first (nulls-first) and must not match a finite right")
  }
}
