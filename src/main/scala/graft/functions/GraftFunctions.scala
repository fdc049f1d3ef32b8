package graft.functions

import org.apache.spark.sql.SparkSession

import graft.expressions.{CharNgrams, FloatVecCosine, FloatVecDot, FloatVecL2, MinHashSigs, MinHashSketchAgg, SortedLongIntersectCount, SortedTokenHashes}

/** SQL surface for the engine's custom expressions: after `register`,
  * `spark.sql("SELECT vec_cosine(a, b) ...")` resolves to the fused
  * codegen'd Catalyst expressions — the same functions the Column API
  * exposes through `VectorFunctions`. */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("vec_dot",
      exprs => FloatVecDot(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("vec_cosine",
      exprs => FloatVecCosine(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("vec_l2",
      exprs => FloatVecL2(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("minhash_sigs",
      exprs => {
        val n = exprs(1) match {
          case e if e.foldable => e.eval() match {
            case i: Number => i.intValue()
            case other => throw new IllegalArgumentException(
              s"minhash_sigs(text, numHashes): numHashes must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "minhash_sigs(text, numHashes): numHashes must be a literal (foldable), " +
              "got a non-constant expression")
        }
        MinHashSigs(exprs(0), n)
      }, "built-in")
    registry.createOrReplaceTempFunction("char_ngrams",
      exprs => {
        val n = exprs(1) match {
          case e if e.foldable => e.eval() match {
            case i: Number => i.intValue()
            case other => throw new IllegalArgumentException(
              s"char_ngrams(text, n): n must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "char_ngrams(text, n): n must be a literal (foldable), " +
              "got a non-constant expression")
        }
        CharNgrams(exprs(0), n)
      }, "built-in")
    registry.createOrReplaceTempFunction("minhash_sketch",
      exprs => {
        val n = exprs(1) match {
          case e if e.foldable => e.eval() match {
            case i: Number => i.intValue()
            case other => throw new IllegalArgumentException(
              s"minhash_sketch(text, n): n must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "minhash_sketch(text, n): n must be a literal (foldable), " +
              "got a non-constant expression")
        }
        MinHashSketchAgg(exprs(0), n)
      }, "built-in")
    registry.createOrReplaceTempFunction("sorted_token_hashes",
      exprs => SortedTokenHashes(exprs(0)), "built-in")
    registry.createOrReplaceTempFunction("sorted_long_intersect_count",
      exprs => SortedLongIntersectCount(exprs(0), exprs(1)), "built-in")
    // expression-chain functions: the builder may return an UNRESOLVED
    // tree here — registry builders run during analysis, which resolves
    // the Column API's lambda variables (unlike an optimizer rule). The
    // conversion must be EAGER (convertedExpression): the lazy wrapper
    // from `expression` would survive into codegen and fail there.
    registry.createOrReplaceTempFunction("url_normalize",
      exprs => org.apache.spark.sql.GraftBridge.convertedExpression(
        TextFunctions.normalizeUrl(
          org.apache.spark.sql.GraftBridge.column(exprs(0)))), "built-in")
    registry.createOrReplaceTempFunction("canonical_text",
      exprs => org.apache.spark.sql.GraftBridge.convertedExpression(
        TextFunctions.canonicalText(
          org.apache.spark.sql.GraftBridge.column(exprs(0)))), "built-in")
  }
}
