package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the similarity/dedup hot paths.
  *
  * The declarative alternatives (`aggregate(zip_with(...))`, per-char
  * lambda folds) run interpreted inside higher-order functions and
  * allocate per element; these run as tight loops inside whole-stage
  * codegen (`doGenCode`), which is the preferred extension point before
  * any UDF (see the project contract: functions > Expression > UDF). */

/** Int64 dot product of two ArrayType(LongType) columns. */
case class LongDotExpr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[GraftShim.AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Rolling polynomial hash h -> (h*prime + byte) % mod over a string's
  * UTF-8 bytes. Identical to a per-character ascii() fold for ASCII
  * input (the oracle's formulation). */
case class ByteRollHashExpr(child: Expression, prime: Long, mod: Long)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[GraftShim.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "byte_roll_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * prime + (bytes(i) & 0xff)) % mod; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * ${prime}L + ($bytes[$i] & 0xff)) % ${mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExprs {
  def longDot(a: Column, b: Column): Column =
    GraftShim.column(
      LongDotExpr(GraftShim.expression(a), GraftShim.expression(b)))

  def byteRollHash(s: Column, prime: Long, mod: Long): Column =
    GraftShim.column(
      ByteRollHashExpr(GraftShim.expression(s), prime, mod))
}
