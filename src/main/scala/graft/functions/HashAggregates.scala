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

/**
 * md5-family MinHash signature aggregate over raw shingle STRINGS — the
 * single-pass form of the oracle-checkable family: slot i of shingle s is
 * min over the group of md5(i || ':' || s), compared lexicographically as
 * lowercase hex (exactly `min(md5(concat(i, ':', s)))` per slot).
 *
 * Why: the Column formulation exploded every shingle k ways
 * (`explode(sequence(0, k-1))`), shuffled (id, slot) rows into a
 * `groupBy(id, i).agg(min(md5(...)))`, then RE-shuffled into a
 * `groupBy(id, band)` with `array_sort(collect_list(struct(...)))` to
 * reassemble slot order — two exchanges and a k× row blow-up for what is
 * one fixed-size buffer per doc. This aggregate keeps k 16-byte digests
 * per group (unsigned byte-wise comparison ≡ lowercase-hex string order,
 * since nibble → hex char is monotonic), updates them in one tight loop
 * per shingle, and emits the k slots as hex strings in slot order — one
 * ObjectHashAggregate with map-side partial aggregation, zero extra
 * exchanges. The md5-per-(shingle, slot) cost itself is preserved: it IS
 * the cross-engine replay contract (DuckDB recomputes every digest).
 */
case class MinHashMd5Agg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with ExpectsInputTypes with UnaryLike[Expression] {
  require(k > 0, "k must be positive")

  override def prettyName: String = "graft_minhash_md5"
  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  // buffer: k 16-byte digests + 1 trailing "updated" flag byte; the flag
  // (not a sentinel digest value) marks the never-updated partial buffer
  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
  @transient private lazy val slotPrefix: Array[Array[Byte]] =
    Array.tabulate(k)(i => (i.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](16 * k + 1)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val sBytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      val fresh = buf(16 * k) == 0
      var i = 0
      while (i < k) {
        md.reset()
        md.update(slotPrefix(i))
        md.update(sBytes)
        val d = md.digest()
        val off = 16 * i
        if (fresh || java.util.Arrays.compareUnsigned(d, 0, 16, buf, off, off + 16) < 0)
          System.arraycopy(d, 0, buf, off, 16)
        i += 1
      }
      buf(16 * k) = 1
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    if (b2(16 * k) == 0) b1
    else if (b1(16 * k) == 0) b2
    else {
      var i = 0
      while (i < k) {
        val off = 16 * i
        if (java.util.Arrays.compareUnsigned(b2, off, off + 16, b1, off, off + 16) < 0)
          System.arraycopy(b2, off, b1, off, 16)
        i += 1
      }
      b1
    }
  }

  override def eval(buf: Array[Byte]): Any = {
    if (buf(16 * k) == 0) null
    else {
      val hexDigits = "0123456789abcdef".toCharArray
      val out = new Array[Any](k)
      var i = 0
      while (i < k) {
        val cs = new Array[Char](32)
        var j = 0
        while (j < 16) {
          val b = buf(16 * i + j) & 0xff
          cs(2 * j) = hexDigits(b >>> 4)
          cs(2 * j + 1) = hexDigits(b & 0xf)
          j += 1
        }
        out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(new String(cs))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashMd5Agg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashMd5Agg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashMd5Agg =
    copy(child = newChild)
}

/**
 * argmin-by-(double key, long value) — `min_by(value, struct(key, value))`
 * for a LongType value, as a [[TypedImperativeAggregate]].
 *
 * Why: min_by/max_by with a struct ordering key (and `first` over an
 * array column) have agg buffers that are not mutable-buffer types, so
 * the whole aggregate plans as a SortAggregate — the IVF encode pass was
 * paying a map-side sort of the corpus × k centroid fan-out just to pick
 * each vector's argmax. One TypedImperativeAggregate in the aggregate
 * list flips the plan to ObjectHashAggregate (hash-based, partial
 * aggregation, no sort), which also carries the co-grouped declarative
 * aggs (the vector passthrough).
 *
 * Ordering semantics match Spark's interpreted/codegen'd double ordering
 * exactly: -0.0 == 0.0, NaN greater than everything, NaN == NaN; ties on
 * the key resolve to the SMALLEST value — bit-identical to the
 * `min_by(v, struct(k, v))` it replaces (pinned by ArgMinLongSpec).
 * Null keys or values are ignored (the callers coalesce keys and have
 * non-null values by construction).
 */
case class ArgMinLongAgg(
    value: Expression,
    key: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def prettyName: String = "graft_argmin_long"
  override def left: Expression = value
  override def right: Expression = key
  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(LongType, DoubleType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  // buffer: [hasValue (0/1), doubleToLongBits(bestKey), bestValue]
  override def createAggregationBuffer(): Array[Long] = new Array[Long](3)

  // Spark's SQL double ordering: -0.0 == 0.0, NaN == NaN, NaN greatest
  private def cmpKey(x: Double, y: Double): Int =
    if (x < y) -1
    else if (x > y) 1
    else {
      val xn = x != x
      val yn = y != y
      if (xn == yn) 0 else if (xn) 1 else -1
    }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = value.eval(input)
    val k = key.eval(input)
    if (v != null && k != null) {
      val kd = k.asInstanceOf[Double]
      val vl = v.asInstanceOf[Long]
      if (buf(0) == 0L) {
        buf(0) = 1L
        buf(1) = java.lang.Double.doubleToRawLongBits(kd)
        buf(2) = vl
      } else {
        val c = cmpKey(kd, java.lang.Double.longBitsToDouble(buf(1)))
        if (c < 0 || (c == 0 && vl < buf(2))) {
          buf(1) = java.lang.Double.doubleToRawLongBits(kd)
          buf(2) = vl
        }
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b2(0) == 0L) b1
    else if (b1(0) == 0L) b2
    else {
      val c = cmpKey(java.lang.Double.longBitsToDouble(b2(1)),
        java.lang.Double.longBitsToDouble(b1(1)))
      if (c < 0 || (c == 0 && b2(2) < b1(2))) b2 else b1
    }
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(0) == 0L) null else buf(2)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(24)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(3)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMinLongAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgMinLongAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMinLongAgg =
    copy(value = newLeft, key = newRight)
}
