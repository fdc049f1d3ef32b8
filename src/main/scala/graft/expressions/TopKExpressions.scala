package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded per-group top-k aggregate: `score_topk(score, id, k)` keeps the
  * k (score DESC, id ASC) best entries of the group and evaluates to an
  * ORDERED `array<struct<id, score>>` (rank order — element 1 is the best).
  *
  * The point is the SHUFFLE SHAPE of batched retrieval: scoring a query
  * block against a corpus emits |corpus| × |queries| scored rows, and
  * ranking them with a window function shuffles ALL of them to the
  * per-query reducers. This aggregate is partial-merge-able, so map-side
  * combine folds each task's scored rows into one k-entry buffer per query
  * BEFORE the exchange — the shuffle carries |queries| × |tasks| buffers of
  * k entries, independent of corpus size. At 1000 executors × 100 TB that
  * is the difference between a quadratic exchange and kilobytes per task.
  *
  * Ties break by id ascending, so the result is deterministic on any
  * partitioning/layout. NULL scores and NULL ids are skipped (a NULL never
  * outranks a real score; a NULL id is unrankable). Ids may be any
  * integral/string/double type (covers every id column in this repo);
  * scores cast to double upstream.
  */
case class ScoreTopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Any)]]
  with BinaryLike[Expression] {

  // the upper bound is the 100 TB contract made explicit: the buffer is
  // O(k) per group per task and the shuffle carries |groups|×|tasks|×k
  // entries — a runaway k would silently turn the bounded partial top-k
  // back into the quadratic exchange this aggregate exists to avoid
  require(k > 0 && k <= 10000, s"score_topk needs 0 < k <= 10000, got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double score, got ${score.dataType}")
    else id.dataType match {
      case LongType | IntegerType | StringType | DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName supports long/int/string/double ids, got $other")
    }
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", id.dataType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "score_topk"

  /** id ordering for ties (ascending). */
  private lazy val idLt: (Any, Any) => Boolean = id.dataType match {
    case LongType => (a, b) => a.asInstanceOf[Long] < b.asInstanceOf[Long]
    case IntegerType => (a, b) => a.asInstanceOf[Int] < b.asInstanceOf[Int]
    case DoubleType => (a, b) => a.asInstanceOf[Double] < b.asInstanceOf[Double]
    case StringType =>
      (a, b) => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]) < 0
    case other => throw new IllegalStateException(s"unsupported id type $other")
  }

  /** Rank order: score DESC, id ASC — a `<` under which "smaller" = better.
    * Compares via `java.lang.Double.compare` for a TOTAL order: a raw
    * `>`/`==` pair is intransitive on NaN (NaN ties with everything while
    * real values still order), which TimSort rejects with "Comparison
    * method violates its general contract". NaN scores are also skipped
    * at [[update]], so none should reach here — totality is the backstop. */
  private def rankLt(a: (Double, Any), b: (Double, Any)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && idLt(a._2, b._2))
  }

  /** Compaction threshold: amortize the sort, bound the buffer. */
  private def cap: Int = math.max(4 * k, 64)

  private def compact(buf: ArrayBuffer[(Double, Any)]): ArrayBuffer[(Double, Any)] = {
    if (buf.length > k) {
      val kept = buf.sortWith(rankLt).take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Any)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, Any)],
      input: InternalRow): ArrayBuffer[(Double, Any)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    // NaN skipped alongside NULL: a NaN score (e.g. a NaN vector element
    // propagated through cosine) never outranks a real score, and letting
    // it into the buffer would poison the sort's total order
    if (s == null || i == null ||
      java.lang.Double.isNaN(s.asInstanceOf[Double])) return buf
    // UTF8String from an UnsafeRow may alias reused row memory — copy
    val iv = i match {
      case u: UTF8String => u.clone()
      case other => other
    }
    buf += ((s.asInstanceOf[Double], iv))
    if (buf.length >= cap) compact(buf) else buf
  }

  override def merge(buf: ArrayBuffer[(Double, Any)],
      other: ArrayBuffer[(Double, Any)]): ArrayBuffer[(Double, Any)] = {
    buf ++= other
    compact(buf)
  }

  override def eval(buf: ArrayBuffer[(Double, Any)]): Any =
    new GenericArrayData(buf.sortWith(rankLt).take(k)
      .map { case (s, i) => InternalRow(i, s) }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Any)]): Array[Byte] = {
    compact(buf)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, i) =>
      out.writeDouble(s)
      id.dataType match {
        case LongType => out.writeLong(i.asInstanceOf[Long])
        case IntegerType => out.writeInt(i.asInstanceOf[Int])
        case DoubleType => out.writeDouble(i.asInstanceOf[Double])
        case StringType =>
          val bytes = i.asInstanceOf[UTF8String].getBytes
          out.writeInt(bytes.length)
          out.write(bytes)
        case other => throw new IllegalStateException(s"unsupported id type $other")
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Any)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Double, Any)]
    var j = 0
    while (j < n) {
      val s = in.readDouble()
      val i: Any = id.dataType match {
        case LongType => in.readLong()
        case IntegerType => in.readInt()
        case DoubleType => in.readDouble()
        case StringType =>
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
        case other => throw new IllegalStateException(s"unsupported id type $other")
      }
      buf += ((s, i))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ScoreTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ScoreTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ScoreTopKAgg =
    copy(score = newLeft, id = newRight)
}
