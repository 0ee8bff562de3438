package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{toColumn, toExpression, LongInput}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a native typed aggregate: for each of k
  * permutations h_i(x) = (a_i*x + b_i) mod p, keep the minimum over
  * the group's input hashes. One pass, fixed 8k-byte buffer,
  * partial-aggregatable (merge = elementwise min) — so map-side
  * combine applies and the shuffle carries one signature per document
  * instead of every shingle hash.
  *
  * Replaces a higher-order-function chain (k × list_transform +
  * array_min) that Catalyst evaluates interpreted per row. The math
  * is identical to the DuckDB oracle's (same a/b/p constants, inputs
  * pre-reduced mod p so products stay below 2^62).
  */
case class MinHashSigAggExpr(
    child: Expression,
    k: Int,
    p: Long,
    as: Seq[Long],
    bs: Seq[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with LongInput with UnaryLike[Expression] {

  // Seq[Long] indexing boxes on every access; copy once to primitive
  // arrays for the per-row loop (32 lookups per input hash).
  // transient lazy: rebuilt from the serialized as/bs on each executor.
  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // reduce mod p defensively: a raw 60-bit hash times a ~2^30
      // coefficient overflows int64 silently; pre-reduced inputs make
      // this a no-op, unreduced ones (e.g. via the SQL surface) stay
      // correct instead of wrapping. floorMod, not %: a negative input
      // under signed remainder yields a negative residue that beats
      // every legitimate minimum and corrupts the signature.
      val x = java.lang.Math.floorMod(v.asInstanceOf[Long], p)
      var i = 0
      while (i < k) {
        val h = java.lang.Math.floorMod(aArr(i) * x + bArr(i), p)
        if (h < buf(i)) buf(i) = h
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

  // Untouched buffer (zero input rows) yields NULL like built-in
  // min(), not an all-sentinel signature that would band every empty
  // group into the same bucket. buf(0)==MaxValue is unambiguous: real
  // minima are < p << Long.MaxValue.
  override def eval(buf: Array[Long]): Any =
    if (k > 0 && buf(0) == Long.MaxValue) null
    else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    var i = 0
    while (i < k) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(o: Int): MinHashSigAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSigAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MinHashSigAggExpr =
    copy(child = c)
}

object MinHashSig {
  /** Aggregate Column: array<long> of the k per-permutation minima
    * over a LongType column of (already mod-p-reduced) hashes.
    */
  def apply(c: Column, k: Int, p: Long, as: Seq[Long], bs: Seq[Long]): Column =
    toColumn(MinHashSigAggExpr(toExpression(c), k, p, as, bs)
      .toAggregateExpression())
}
