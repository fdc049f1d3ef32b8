package graft.expressions

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** The one-pass winnow_hashes expression must select the same fingerprint
  * VALUE SET as the relational winnowFingerprints form over xxhash64 —
  * randomized strings including multibyte and degenerate shapes — and the
  * winnowing guarantee (shared substring of ≥ w+k−1 chars ⇒ shared
  * fingerprint) must hold. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def rowwise(df: org.apache.spark.sql.DataFrame, k: Int, w: Int) =
    df.select(col("id"), GraftBridge.column(WinnowHashes(
      GraftBridge.expression(col("text")), k, w)).as("fp"))

  private def relational(df: org.apache.spark.sql.DataFrame, k: Int, w: Int) =
    df.select(col("id"),
      TextFunctions.winnowFingerprints(col("text"), k, w, xxhash64(_)).as("fp"))

  test("winnow_hashes == relational winnowFingerprints over random strings") {
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("ab", "abcde fg", "αβγδ εζ", "a🙂b c")
    val docs = (1L to 60L).map { id =>
      val alpha = alphabets((id % alphabets.length).toInt)
      val len = rnd.nextInt(40)
      id -> (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }.toDF("id", "text")
    for ((k, w) <- Seq((3, 4), (5, 2), (1, 1), (8, 10))) {
      val got = rowwise(docs, k, w).collect()
        .map(r => r.getLong(0) -> Option(r.getSeq[Long](1)).map(_.toList)).toMap
      val want = relational(docs, k, w).collect()
        .map(r => r.getLong(0) -> Option(r.getSeq[Long](1)).map(_.toList)).toMap
      assert(got === want, s"divergence at k=$k w=$w")
    }
  }

  test("guarantee: docs sharing a substring of w+k-1 chars share a fingerprint") {
    val (k, w) = (5, 4)
    val shared = "QQQQQQQQ" // w + k - 1 = 8 chars
    val rnd = new scala.util.Random(7)
    def noise(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq(
      (1L, noise(30) + shared + noise(25)),
      (2L, noise(40) + shared + noise(10))).toDF("id", "text")
    val fp = rowwise(docs, k, w).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fp(1L).intersect(fp(2L)).nonEmpty,
      "shared >= w+k-1 substring must produce a shared fingerprint")
  }

  test("edges: short text NULL, m<=w global min, density near 2/(w+1)") {
    val (k, w) = (4, 5)
    val rnd = new scala.util.Random(11)
    val randomText =
      (0 until 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq(
      (1L, "abc"),        // < k chars → NULL
      (2L, "abcdefg"),    // m=4 <= w → one global min
      (3L, randomText)
    ).toDF("id", "text")
    val out = rowwise(docs, k, w).collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out(1L).isEmpty, "fewer than k codepoints must be NULL")
    assert(out(2L).exists(_.length == 1), "m <= w must select one global min")
    val density = out(3L).get.length.toDouble / (randomText.length - (k - 1))
    // paper: expected density 2/(w+1) = 1/3 on random text (distinct mins
    // collapse it only slightly here)
    assert(density > 0.2 && density < 0.45, s"winnow density off: $density")
  }
}
