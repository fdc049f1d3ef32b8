package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C4 gate, encoding-damage metrics, LSH planning, contamination
  * fraction — pathological cases the oracle fixtures don't isolate. */
class CorpusGatesSpec extends SparkSpec {

  import spark.implicits._

  test("c4Gate line rules: punctuation, word floor, javascript") {
    val df = Seq(
      ("keep", "one two three.\nfour five six!\nseven eight nine?\nquote line ten.\"\nand one more here."),
      ("drop_nopunct", "one two three\nfour five six"),
      ("drop_short", "a b.\nc d!"),
      ("drop_js", "enable JavaScript to view this page.\nmore javascript here."),
      ("empty", "")).toDF("id", "text")
    val out = TextFunctions.c4Gate(df, "id", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("keep").getAs[Long]("n_lines_kept") == 5L)
    assert(out("keep").getAs[Long]("n_sentences") == 5L)
    assert(out("keep").getAs[Boolean]("pass"))
    assert(out("keep").getAs[String]("text_clean").startsWith("one two three."))
    Seq("drop_nopunct", "drop_short", "drop_js", "empty").foreach { k =>
      assert(out(k).getAs[Long]("n_lines_kept") == 0L, k)
      assert(!out(k).getAs[Boolean]("pass"), k)
      assert(out(k).getAs[String]("text_clean") == "", k)
    }
  }

  test("c4Gate page rules: lorem ipsum, brace, bad words, sentence floor") {
    val five = "one two three. four five six. seven eight nine. ten eleven twelve. final sentence here."
    val df = Seq(
      ("ok", five),
      ("lorem", five + "\nthis has Lorem Ipsum filler."),
      ("brace", five + "\nfunction() { return; }"),
      ("few", "just one two three.")).toDF("id", "text")
    val out = TextFunctions.c4Gate(df, "id", "text",
        badWords = Seq("filler"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("ok").getAs[Boolean]("pass"))
    assert(!out("lorem").getAs[Boolean]("r_lorem"))
    assert(!out("lorem").getAs[Boolean]("r_badwords")) // 'filler' is planted
    assert(!out("brace").getAs[Boolean]("r_brace"))
    assert(!out("few").getAs[Boolean]("r_sentences"))
    assert(!out("few").getAs[Boolean]("pass"))
  }

  test("c4Gate page rules read the ORIGINAL text: a brace on a dropped line still rejects") {
    import spark.implicits._
    val five = "one two three. four five six. seven eight nine. " +
      "ten eleven twelve. final sentence here."
    // the brace sits on a line the line filter drops (no terminal punct),
    // but C4 rejects pages containing '{' anywhere — matching the paper
    // and the q_c4_gate oracle, which also evaluates the raw page
    val df = Seq(("x", five + "\nnav { menu")).toDF("id", "text")
    val r = TextFunctions.c4Gate(df, "id", "text").collect().head
    assert(r.getAs[Long]("n_lines_kept") == 1L) // the brace line dropped
    assert(!r.getAs[Boolean]("r_brace") && !r.getAs[Boolean]("pass"))
  }

  test("encodingQualityMetrics counts each damage class and verdicts") {
    val df = Seq(
      ("clean", "a perfectly ordinary sentence of text"),
      ("repl", "broken \uFFFD here \uFFFD\uFFFD"),
      ("ctrl", "bell\u0007 and null\u0000 bytes"),
      ("tabs_ok", "tab\tand\nnewline\rare fine"),
      ("moji", "caf\u00C3\u00A9 na\u00C3\u00AFve \u00C2\u00A0"),
      ("empty", "")).toDF("id", "text")
    val out = TextFunctions.encodingQualityMetrics(df, "id", "text",
        maxBadRatio = 0.01)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("clean").getAs[Long]("n_replacement") == 0L)
    assert(out("clean").getAs[Boolean]("clean"))
    assert(out("repl").getAs[Long]("n_replacement") == 3L)
    assert(!out("repl").getAs[Boolean]("clean"))
    assert(out("ctrl").getAs[Long]("n_control") == 2L)
    assert(out("tabs_ok").getAs[Long]("n_control") == 0L)
    assert(out("moji").getAs[Long]("n_mojibake") == 3L)
    assert(out("empty").getAs[Double]("bad_char_ratio") == 0.0)
    assert(out("empty").getAs[Boolean]("clean"))
  }

  test("lshPlan picks the factorization nearest the target, steeper on ties") {
    assert(graft.dedup.Dedup.lshPlan(8, 0.8) == (2, 4))
    assert(graft.dedup.Dedup.lshPlan(8, 0.45) == (4, 2))
    assert(graft.dedup.Dedup.lshPlan(8, 0.1) == (8, 1))
    assert(graft.dedup.Dedup.lshPlan(16, 0.7) == (4, 4))
    // the module's near-dup default (8 hashes, r=2 → b=4) targets ~0.5:
    // the planner recovers it
    assert(graft.dedup.Dedup.lshPlan(8, 0.5) == (4, 2))
  }

  test("contaminationFraction: exact fractions, short docs, clean docs") {
    val train = Seq(
      (1L, "a b c d e"),   // shingles(3): "a b c","b c d","c d e"
      (2L, "a b"),         // too short: no shingles
      (3L, "x y z w v")).toDF("doc_id", "text")
    val bench = Seq((9L, "b c d e f")).toDF("doc_id", "text")
    val out = graft.trainprep.TrainPrep.contaminationFraction(
        train, "doc_id", "text", bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // bench shingles: "b c d","c d e","d e f" → doc 1 shares 2 of its 3
    assert(out(1L).getAs[Long]("n_shingles") == 3L)
    assert(out(1L).getAs[Long]("n_contaminated") == 2L)
    assert(out(1L).getAs[Double]("contaminated_frac") == 0.666667)
    assert(out(2L).getAs[Long]("n_shingles") == 0L)
    assert(out(2L).getAs[Double]("contaminated_frac") == 0.0)
    assert(out(3L).getAs[Long]("n_contaminated") == 0L)
  }
}
