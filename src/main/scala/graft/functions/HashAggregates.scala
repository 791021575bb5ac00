package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, XXH64}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/**
 * Custom aggregate functions for document-signature computation
 * (MinHash / SimHash dedup, SURVEY §7.1 step 9).
 *
 * Why custom aggregates: the Column formulation of a k-wide MinHash is k
 * separate `min()` aggregate columns (and SimHash is 64 `sum()` bit
 * counters) — semantically right and map-side combined, but the generated
 * aggregate code grows with k, and at k=128 janino compilation dominated
 * the whole query (bench: near-identical wall time at sf0.01 and sf0.1 —
 * the work was COMPILING, not hashing). A [[TypedImperativeAggregate]]
 * keeps one fixed-size primitive-array buffer per group and a tight
 * update loop; Spark plans it as ObjectHashAggregate with partial
 * aggregation (map-side combine, sort-based spill fallback) — the same
 * scale shape, constant-size codegen.
 *
 * Hash family preserved from the Column version: slot i of a shingle
 * hashed to `h` is `xxhash64(h, i)` — reproduced exactly via the same
 * XXH64 chain Spark's `xxhash64` builtin uses (seed 42, then the long,
 * then the int), so signatures are bit-identical to the old plan.
 */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {
  require(k > 0, "k must be positive")

  override def prettyName: String = "graft_minhash"
  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // xxhash64(h, i) = hashInt(i, hashLong(h, 42)) — the long's hash is
      // slot-invariant, so it's computed once per input row
      val base = XXH64.hashLong(v.asInstanceOf[Long], 42L)
      var i = 0
      while (i < k) {
        val hi = XXH64.hashInt(i, base)
        if (hi < buf(i)) buf(i) = hi
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

/**
 * 64-bit SimHash signature aggregate over shingle-hash longs: buffer is
 * 64 one-bit counters plus the row count; bit b of the result is set iff
 * ones(b)·2 > n (strict majority — identical to the 64-sum-column
 * formulation it replaces). See [[MinHashAgg]] for the why.
 */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def prettyName: String = "graft_simhash"
  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  // slots 0..63: ones-count per bit; slot 64: total rows
  override def createAggregationBuffer(): Array[Long] = new Array[Long](65)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) { buf(b) += (h >>> b) & 1L; b += 1 }
      buf(64) += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 65) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(64)
    var sig = 0L
    var b = 0
    while (b < 64) { if (buf(b) * 2 > n) sig |= (1L << b); b += 1 }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 65)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(65)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}
