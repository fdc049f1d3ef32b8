package graft.functions

import graft.SparkSpec

/** SQL registration: the custom vector expressions are callable from
  * spark.sql and agree with the Column API. */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot / vec_cosine / vec_l2 resolve in SQL and match the Column API") {
    GraftFunctions.register(spark)
    Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b").createOrReplaceTempView("v")
    val r = spark.sql(
      "SELECT vec_dot(a, b) AS d, vec_cosine(a, b) AS c, vec_l2(a, b) AS l FROM v").head
    assert(r.getDouble(0) === 32.0)
    assert(math.abs(r.getDouble(1) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
    assert(math.abs(r.getDouble(2) - math.sqrt(27.0)) < 1e-12)
  }

  test("url_normalize / canonical_text resolve in SQL and match the Column API") {
    GraftFunctions.register(spark)
    Seq(("HTTPS://Site.COM:443/A/?b=2&utm_source=x&a=1#f", "Café  X\tY"))
      .toDF("u", "t").createOrReplaceTempView("gf_sql")
    val r = spark.sql(
      "SELECT url_normalize(u) AS n, canonical_text(t) AS c FROM gf_sql").head
    assert(r.getString(0) == "https://site.com/A?a=1&b=2")
    assert(r.getString(1) == "café x y")
  }
}
