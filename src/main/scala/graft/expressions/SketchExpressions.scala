package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Group-level MinHash sketch: `minhash_sketch(text, n)` aggregates the
  * element-wise minimum of the [[MinHashSigs]] hash family over every row
  * of the group — i.e. the MinHash signature of the UNION of the groups'
  * token sets. Two group sketches estimate the Jaccard similarity of the
  * groups' vocabularies as the fraction of equal components — corpus-slice
  * overlap (source vs source, shard vs shard, train vs incoming batch)
  * WITHOUT any pairwise token join.
  *
  * Shape at scale: a [[TypedImperativeAggregate]] over a fixed
  * 8·numHashes-byte buffer — each input row folds its tokens straight into
  * the running minima in one byte scan (no token explode, no per-token
  * rows), partial buffers combine map-side, and the shuffle carries ONE
  * buffer per (group × task). The relational formulation
  * (explode tokens → groupBy(group, k) → min → re-pack) shuffles a row per
  * token per seed; this carries 8·n bytes per group regardless of corpus
  * size.
  *
  * Hash-family parity: seed k is `XXH64.hashInt(k, 42)` — identical to
  * [[MinHashSigs]] and to the column formulation
  * `min(xxhash64(lit(k), tok))`, so a single-row group's sketch equals
  * that row's `minhash_sigs` signature bit for bit (spec-pinned), and
  * sketches computed by either path compare. Token parity with
  * `split(text, " ", -1)`: empty tokens (consecutive / leading / trailing
  * spaces, empty string) are hashed too. NULL texts contribute nothing;
  * a group of only NULLs yields the empty sketch (all Long.MaxValue). */
case class MinHashSketchAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numHashes > 0, "minhash_sketch needs numHashes > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sketch"

  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val s = v.asInstanceOf[UTF8String]
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == 0x20) {
        var k = 0
        while (k < numHashes) {
          val hv = XXH64.hashUnsafeBytes(base, off + start, i - start, seeds(k))
          if (hv < buffer(k)) buffer(k) = hv
          k += 1
        }
        start = i + 1
      }
      i += 1
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) {
      if (other(k) < buffer(k)) buffer(k) = other(k)
      k += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numHashes * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSketchAgg =
    copy(child = newChild)
}
