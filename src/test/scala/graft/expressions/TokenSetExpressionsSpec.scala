package graft.expressions

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** The rowwise sorted-token-hash set must equal the relational
  * explode(array_distinct(split))→xxhash64 formulation it replaces, and the
  * in-row merge intersection must count exactly the common elements —
  * under both interpreted eval and codegen. */
class TokenSetExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "the quick  brown fox"),   // double space → empty token survives
    (3L, " leading and trailing "),
    (4L, ""),                       // empty doc → one empty token
    (5L, "dup dup dup"),            // repeats collapse to one set element
    (6L, "the quick brown fox")
  ).toDF("doc_id", "text")

  private def setCol = GraftBridge.column(
    SortedTokenHashes(GraftBridge.expression(col("text"))))

  test("sorted_token_hashes == sorted distinct xxhash64 over exploded tokens") {
    val rel = docs
      .select(col("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col("text")))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      .groupBy("doc_id").agg(sort_array(collect_list("h")).as("hs"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val row = docs.select(col("doc_id"), setCol.as("hs"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    assert(row.toSeq == rel.toSeq)
    assert(row(4).length == 1, "repeated tokens collapse to one element")
  }

  test("interpreted eval matches codegen") {
    val viaCodegen = docs.select(setCol).collect().map(_.getSeq[Long](0).toSeq)
    val viaEval = docs.select("text").collect().map { r =>
      SortedTokenHashes(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .toLongArray().toSeq
    }
    assert(viaCodegen.toSeq == viaEval.toSeq)
  }

  test("intersect count equals the token-set intersection size; Jaccard is exact") {
    val pairs = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        GraftBridge.column(SortedTokenHashes(GraftBridge.expression(col("a.text")))).as("ta"),
        GraftBridge.column(SortedTokenHashes(GraftBridge.expression(col("b.text")))).as("tb"))
      .withColumn("inter", GraftBridge.column(SortedLongIntersectCount(
        GraftBridge.expression(col("ta")), GraftBridge.expression(col("tb")))))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    val sets = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSet).toMap
    for (((a, b), n) <- pairs)
      assert(n == (sets(a) intersect sets(b)).size, s"pair ($a,$b)")
    assert(pairs((1L, 6L)) == 4L, "identical docs intersect fully")
  }

  test("null text yields null set; null set yields null intersection") {
    val d = Seq((1L, Option("a b")), (2L, Option.empty[String])).toDF("doc_id", "text")
    val out = d.select(setCol.as("s"))
      .withColumn("i", GraftBridge.column(SortedLongIntersectCount(
        GraftBridge.expression(col("s")), GraftBridge.expression(col("s")))))
      .orderBy(col("s").isNull).collect()
    assert(!out(0).isNullAt(0) && out(0).getLong(1) == 2L)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
  }

  test("fuzz: byte-scan tokenization matches split(' ') on random unicode text") {
    // the expression scans raw UTF-8 bytes for 0x20; this must agree with
    // Spark's split-on-space for any text, including multibyte chars,
    // consecutive/leading/trailing spaces, and the empty string
    // code-point alphabet (no split surrogate pairs); NBSP must NOT separate
    val alphabet = Array("a", "b", " ", "\u03b8", "\u4e2d", "\u00e9", "\ud83d\ude42", " ", " ", "\u00a0", "\u00df")
    val rnd = new scala.util.Random(7)
    val texts = Seq("") ++ Seq.fill(60)(
      (0 until rnd.nextInt(24)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rel = df
      .select(col("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col("text")))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      .groupBy("doc_id").agg(sort_array(collect_list("h")).as("hs"))
    // left join: every doc (incl. empty text → one empty token) must emit
    val row = df.select(col("doc_id"), setCol.as("hs"))
    val both = row.join(rel.withColumnRenamed("hs", "hs_rel"), "doc_id")
      .collect()
    assert(both.length === texts.length)
    for (r <- both)
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"doc ${r.getLong(0)}")
  }

  test("SQL registration resolves both functions") {
    graft.functions.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("ts_docs")
    val n = spark.sql(
      """SELECT sorted_long_intersect_count(sorted_token_hashes(text),
        |  sorted_token_hashes(text)) AS i FROM ts_docs WHERE doc_id = 1
        |""".stripMargin).as[Long].head()
    assert(n == 4L)
  }
}
