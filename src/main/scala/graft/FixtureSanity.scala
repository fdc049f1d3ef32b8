package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Guard against silent fixture drift: the round-9 regression was the
  * testdata producer switching `events.ts` from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS) — 24 queries threw at analysis and two streaming
  * queries returned plausible-looking WRONG answers before anything noticed.
  * This check makes the NEXT drift a one-line diagnosis: it asserts the
  * logical type of every column the engine depends on, with an explicit
  * allow-set where the producer has legitimately varied (ts precision).
  *
  * Run standalone (`runMain graft.FixtureSanity [dir]`), from Verify's
  * startup (diagnose-but-continue: the adaptive reader may still handle a
  * drifted type, and a partial verify round beats an empty one), or from
  * FixtureSanitySpec (hard gate in `sbt test`).
  */
object FixtureSanity {

  /** Accepted types per (table, column) the engine reads. `ts` accepts every
    * precision the producer has shipped; all else is pinned exactly. */
  private val expected: Map[String, Seq[(String, Set[DataType])]] = {
    def one(cols: (String, DataType)*): Seq[(String, Set[DataType])] =
      cols.map { case (n, t) => n -> Set(t) }
    Map(
      "region" -> one("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation" -> one("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType),
      "customer" -> one("c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType),
      "supplier" -> one("s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
      "part" -> one("p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
      "orders" -> (one("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType)
        ++ Seq("o_orderdate" -> dateLikeTypes) ++ one("o_orderpriority" -> StringType)),
      "lineitem" -> (one("l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType)
        ++ Seq("l_shipdate" -> dateLikeTypes)),
      "events" -> (one("event_id" -> LongType)
        ++ Seq("ts" -> (tsTypes + LongType)) // LONG = TIMESTAMP(NANOS) under nanosAsLong
        ++ one("user_id" -> LongType, "event_type" -> StringType,
          "value" -> DoubleType, "props" -> StringType)),
      "documents" -> one("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
      "embeddings" -> (one("vec_id" -> LongType)
        ++ Seq("embedding" -> Set[DataType](ArrayType(FloatType, true),
          ArrayType(FloatType, false)))
        ++ one("label" -> IntegerType)))
  }

  private def tsTypes: Set[DataType] = Set(TimestampNTZType, TimestampType)

  /** Conceptually-date columns: a regeneration could reasonably flip them
    * between TIMESTAMP and DATE — DateDriftSpec proves every engine access
    * pattern yields identical results under either encoding. */
  private def dateLikeTypes: Set[DataType] = tsTypes + DateType

  /** All (table, column, observed, accepted) mismatches + missing columns for
    * a fixture dir. Empty = sane. Tables absent from the dir are skipped
    * (sf dirs legitimately vary in which extension tables exist). */
  def anomalies(spark: SparkSession, dir: String): Seq[String] =
    expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val f = new java.io.File(s"$dir/$table.parquet")
      if (!f.exists()) Nil
      else {
        val schema = spark.read.parquet(f.getPath).schema
        val byName = schema.fields.map(x => x.name -> x.dataType).toMap
        cols.flatMap { case (name, ok) =>
          byName.get(name) match {
            case None => Some(s"$table.$name: MISSING (observed schema: ${schema.simpleString})")
            case Some(t) if !ok(t) =>
              Some(s"$table.$name: observed ${t.simpleString}, accepted " +
                ok.map(_.simpleString).mkString("{", ", ", "}"))
            case _ => None
          }
        }
      }
    }

  /** Diagnose-and-report (used by Verify): prints each anomaly to stderr
    * loudly; returns whether the fixture is sane. */
  def report(spark: SparkSession, dir: String): Boolean = {
    val bad = anomalies(spark, dir)
    bad.foreach(a => System.err.println(s"[FIXTURE DRIFT] $a"))
    bad.isEmpty
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sane = report(spark, dir)
    println(if (sane) s"fixture sane: $dir" else s"FIXTURE DRIFT in $dir (see stderr)")
    spark.stop()
    if (!sane) sys.exit(1)
  }
}
