package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** One-pass exact Gram/covariance sums over an int64 vector column.
  *
  * Emits a single `Array[Long]` of length `1 + dim + dim·(dim+1)/2`,
  * laid out `[n, Σxᵢ (dim entries), Σxᵢxⱼ for i ≤ j (row-major upper
  * triangle)]`. Rows whose array is null or shorter than `dim` are
  * skipped (they contribute to none of the sums, matching a
  * where-filtered scan).
  *
  * Why an imperative aggregate and not explode+groupBy: the declarative
  * covariance formulation explodes every row into dim·(dim+1)/2
  * (i, j, x, y) structs before the hash aggregate — at dim=64 that is
  * 2080 row objects per input row, and the 100× stress point measured
  * 65 s for what is arithmetically ~4e8 multiply-adds. This buffer does
  * the same exact int64 math as a tight per-partition loop: the shuffle
  * carries ONE ~17 KB array per partition (classic distributed XᵀX),
  * and per-row cost is the flop count itself with zero allocation. At
  * 1e9 rows × dim 64 the partial-buffer shuffle is still #partitions ×
  * 17 KB — independent of N.
  *
  * Determinism: int64 addition is associative/commutative, so the merge
  * order Spark picks cannot change any sum — exactness does not depend
  * on partitioning, which is what lets the DuckDB oracle recompute the
  * identical values from first principles. Overflow headroom: at 1e-4
  * ticks (|x| ≲ 2e4 for unit-norm floats) Σxᵢxⱼ stays below 2^63 to
  * ~2e10 rows.
  */
case class GramSumsAgg(
    child: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  private val tri = dim * (dim + 1) / 2
  private val size = 1 + dim + tri

  override def inputTypes: Seq[GraftShim.AbstractDataType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_sums"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](size)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() >= dim) {
        buf(0) += 1L
        var i = 0
        var idx = 1 + dim
        while (i < dim) {
          val xi = a.getLong(i)
          buf(1 + i) += xi
          var j = i
          while (j < dim) {
            buf(idx) += xi * a.getLong(j)
            idx += 1
            j += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(size * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](size)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramSumsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramSumsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramSumsAgg =
    copy(child = newChild)
}

object GramAgg {
  /** `gram_sums(vec)` as an aggregate Column. */
  def gramSums(c: Column, dim: Int): Column =
    GraftShim.column(
      GramSumsAgg(GraftShim.expression(c), dim).toAggregateExpression())
}
