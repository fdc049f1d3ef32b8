package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The declarative fuzzy join `levenshtein(l, r) <= d` must silently plan
  * as the FastSS bucketed equi-join (no cartesian), with results equal to
  * the brute-force semantics — including row multiplicity and NULLs. The
  * rule is active through the session's GraftExtensions, same as
  * production. */
class FuzzyJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def localLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val left = Seq(
    (1L, "kitten"), (2L, "sitten"), (3L, "totally different"),
    (4L, "kitten"), // duplicate row: multiplicity must survive
    (5L, null.asInstanceOf[String]), (6L, "")
  ).toDF("lid", "lk")
  private val right = Seq(
    (10L, "kitten"), (11L, "kitte"), (12L, "sittin"),
    (13L, "unrelated"), (14L, "a")
  ).toDF("rid", "rk")

  private def expected(d: Int): Set[(Long, Long)] = {
    val ls = Seq(1L -> "kitten", 2L -> "sitten", 3L -> "totally different",
      4L -> "kitten", 6L -> "")
    val rs = Seq(10L -> "kitten", 11L -> "kitte", 12L -> "sittin",
      13L -> "unrelated", 14L -> "a")
    (for { (l, a) <- ls; (r, b) <- rs if localLev(a, b) <= d } yield (l, r)).toSet
  }

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("levenshtein <= 1 join: bucketed equi-join plan, brute-force results") {
    val joined = left.join(right, levenshtein(col("lk"), col("rk")) <= 1)
    val got = joined.select("lid", "rid").as[(Long, Long)].collect()
    assert(got.toSet === expected(1))
    assert(got.length === got.toSet.size,
      "each qualifying row pair must appear exactly once")
    val plan = planOf(joined)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "the fuzzy join must not plan as a nested loop:\n" + plan.take(1500))
    assert(plan.contains("__graft_h"),
      "the rewrite's bucket column must key the join:\n" + plan.take(1500))
  }

  test("duplicate input rows keep their multiplicity") {
    val joined = left.join(right, levenshtein(col("lk"), col("rk")) <= 0)
    val got = joined.select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 10L), (4L, 10L)))
  }

  test("strict <, swapped argument order, and an extra conjunct all compose") {
    val joined = left.join(right,
      levenshtein(col("rk"), col("lk")) < 2 && col("lid") =!= 2L)
    val got = joined.select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === expected(1).filter(_._1 != 2L))
    assert(!planOf(joined).contains("CartesianProduct"))
  }

  test("d = 2 routes through depth-2 neighborhoods") {
    val joined = left.join(right, levenshtein(col("lk"), col("rk")) <= 2)
    val got = joined.select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === expected(2))
    assert(!planOf(joined).contains("CartesianProduct"))
  }

  test("a join that is already equi-keyed is left alone") {
    val joined = left.join(right,
      col("lid") === col("rid") - 9L && levenshtein(col("lk"), col("rk")) <= 1)
    assert(!planOf(joined).contains("__graft_h"),
      "rule must not fire when a hash key already exists")
    assert(joined.select("lid", "rid").as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (2L, 11L), (3L, 12L)).filter { case (l, r) =>
        val ls = Map(1L -> "kitten", 2L -> "sitten", 3L -> "totally different")
        val rs = Map(10L -> "kitten", 11L -> "kitte", 12L -> "sittin")
        localLev(ls(l), rs(r)) <= 1
      })
  }

  test("levenshtein above the supported distance stays a nested loop (no rewrite)") {
    val joined = left.join(right, levenshtein(col("lk"), col("rk")) <= 5)
    assert(!planOf(joined).contains("__graft_h"))
    val got = joined.select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === expected(5))
  }
}
