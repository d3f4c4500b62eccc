package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distributed sketch aggregates, the "aggregate state itself is big"
  * case the salting comment in EventQueries points at: each is a native
  * `TypedImperativeAggregate`, so it plans as ObjectHashAggregate with
  * map-side partial combine — every partition reduces its rows into one
  * fixed-size sketch, ONE sketch per (partition × group) crosses the
  * shuffle, and finals merge commutatively. That is the whole point of
  * sketches at 100 TB: the shuffle payload is O(k) regardless of input
  * cardinality.
  *
  * Both sketches are DETERMINISTIC (fixed arithmetic hashes, no RNG, and
  * merge order cannot affect the result: KMV keeps a set of minima,
  * CMS adds counters), which is what makes them oracle-checkable
  * bit-for-bit against a DuckDB replica of the same arithmetic.
  */
object Sketches {

  /** KMV buffer: the (at most) k smallest DISTINCT hash values seen. */
  final class KmvBuffer(val minima: java.util.TreeSet[java.lang.Long])

  /** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002):
    * keep the k smallest distinct hash values of the keys; with hashes
    * uniform on [0, M), the kth minimum h_k estimates the distinct
    * count as (k-1)·M / h_k. `child` must already be a hash value in
    * [0, M) — hashing stays in codegen'd column arithmetic OUTSIDE the
    * aggregate so the oracle can replicate it symbol-for-symbol; the
    * aggregate's job is only the bounded-minima state machine.
    *
    * Returns the sorted array of minima (ascending); the estimator is
    * derived in the query so its integer arithmetic is visible to (and
    * replicated by) the oracle.
    */
  case class KmvSketch(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

    require(k > 0, "KMV needs k > 0")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "kmv_minima"

    override def createAggregationBuffer(): KmvBuffer =
      new KmvBuffer(new java.util.TreeSet[java.lang.Long]())

    private def insert(buf: KmvBuffer, h: Long): Unit = {
      // cheap reject keeps the common case (h above current kth min)
      // allocation-free once the buffer is full
      if (buf.minima.size < k) { buf.minima.add(h); () }
      else if (h < buf.minima.last()) {
        if (buf.minima.add(h)) buf.minima.pollLast()
        ()
      }
    }

    override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
      val v = child.eval(input)
      if (v != null) insert(buf, v.asInstanceOf[Long])
      buf
    }

    override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
      val it = b.minima.iterator()
      while (it.hasNext) insert(a, it.next())
      a
    }

    override def eval(buf: KmvBuffer): Any = {
      val out = new Array[Long](buf.minima.size)
      var i = 0
      val it = buf.minima.iterator()
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(buf: KmvBuffer): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 * buf.minima.size)
      bb.putInt(buf.minima.size)
      val it = buf.minima.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): KmvBuffer = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) { buf.minima.add(bb.getLong); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(n: Int): KmvSketch = copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): KmvSketch = copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(c: Expression): KmvSketch = copy(child = c)
  }

  /** Column wrapper: `kmvMinima(hash, k)` → sorted array of the k
    * smallest distinct hash values. */
  def kmvMinima(hash: Column, k: Int): Column =
    Bridge.column(KmvSketch(Bridge.expression(hash), k).toAggregateExpression())

  // ---------------------------------------------------------------- CMS

  /** Count-min sketch (Cormode & Muthukrishnan 2005) over string
    * tokens: `depth` rows × `width` counters; token t increments cell
    * `((poly31(t)·A(j) + B(j)) mod P) mod width` in every row j, and a
    * point estimate is the min over rows — an overestimate bounded by
    * ε·N with prob 1−δ (ε = e/width, δ = e^−depth). Merge is cell-wise
    * addition, so partials combine map-side and the shuffle carries one
    * depth×width array per partition.
    *
    * The row hashes reuse the engine-wide 31-bit polynomial string hash
    * ([[TextFunctions.polyHash31]] semantics) composed with fixed
    * affine maps, so the DuckDB oracle replicates every cell index
    * exactly.
    */
  case class CmsSketch(
      child: Expression,
      depth: Int,
      width: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

    require(depth > 0 && depth <= CmsSketch.RowA.length, s"depth must be in [1, ${CmsSketch.RowA.length}]")
    require(width > 0, "CMS needs width > 0")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "cms_sketch"

    override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = CmsSketch.poly31(v.asInstanceOf[UTF8String])
        var j = 0
        while (j < depth) {
          buf(j * width + CmsSketch.cell(h, j, width)) += 1L
          j += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * buf.length)
      var i = 0
      while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val out = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < out.length) { out(i) = bb.getLong; i += 1 }
      out
    }

    override def withNewMutableAggBufferOffset(n: Int): CmsSketch = copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): CmsSketch = copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(c: Expression): CmsSketch = copy(child = c)
  }

  object CmsSketch {
    val P = 2147483647L
    /** Fixed affine row-hash coefficients (small primes: A(j)·h stays
      * well under 2^63 for h < 2^31, so the arithmetic is overflow-free
      * in both engines). */
    val RowA: Array[Long] = Array(1583L, 2729L, 4177L, 6073L)
    val RowB: Array[Long] = Array(101L, 211L, 307L, 401L)

    /** Same fold as [[TextFunctions.polyHash31]]: h = (h·31 + byte) mod
      * (2^31−1) over the UTF-8 bytes (== character codes for the ASCII
      * corpus the oracle replicates). */
    def poly31(s: UTF8String): Long = {
      val bs = s.getBytes
      var h = 0L
      var i = 0
      while (i < bs.length) { h = (h * 31 + java.lang.Byte.toUnsignedLong(bs(i))) % P; i += 1 }
      h
    }

    def cell(h: Long, j: Int, width: Int): Int = (((h * RowA(j) + RowB(j)) % P) % width).toInt
  }

  /** Column wrapper: `cmsSketch(token, depth, width)` → flattened
    * depth×width counter array (row-major). */
  def cmsSketch(token: Column, depth: Int, width: Int): Column =
    Bridge.column(CmsSketch(Bridge.expression(token), depth, width).toAggregateExpression())

  // ---------------------------------------------------------------- HLL

  /** HyperLogLog registers (Flajolet et al. 2007) over 31-bit hashes:
    * m = 2^p registers; a hash routes to register `h >> (31−p)` (its
    * top p bits) and contributes ρ = 1 + leading-zero count of the
    * remaining 31−p bits; each register keeps the max ρ. Merge is
    * elementwise max — commutative, idempotent, duplicate-insensitive —
    * so partials combine map-side and ONE m-byte array per
    * (partition × group) crosses the shuffle, the industry-standard
    * approximate-distinct shape at 100 TB.
    *
    * Like KMV, the aggregate returns the RAW register array and the
    * estimator stays in the query: the harmonic sum Σ2^(−M_j) is a sum
    * of dyadic rationals spanning ≤ 2^(31−p+1) ulps, exact in a double
    * in ANY summation order, so the estimate is engine-reproducible
    * bit-for-bit — no floating-point caveats anywhere.
    */
  case class HllSketch(
      child: Expression,
      p: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

    require(p >= 4 && p <= 16, "HLL precision must be in [4, 16]")
    private val m = 1 << p
    private val restBits = 31 - p
    private val restMask = (1L << restBits) - 1L

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "hll_registers"

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        val reg = (h >>> restBits).toInt
        val w = h & restMask
        // ρ = 1 + leading zeros of the 31−p remainder bits
        val rho = (if (w == 0L) restBits + 1
                   else restBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
        if (rho > buf(reg)) buf(reg) = rho
      }
      buf
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Byte]): Any = {
      val out = new Array[Long](m)
      var i = 0
      while (i < m) { out(i) = buf(i).toLong; i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

    override def withNewMutableAggBufferOffset(n: Int): HllSketch = copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): HllSketch = copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(c: Expression): HllSketch = copy(child = c)
  }

  /** Column wrapper: `hllRegisters(hash, p)` → the 2^p max-ρ registers. */
  def hllRegisters(hash: Column, p: Int): Column =
    Bridge.column(HllSketch(Bridge.expression(hash), p).toAggregateExpression())
}
