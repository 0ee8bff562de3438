package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-sum-mod-N routing hash — the reference's producer routing
  * function (`change_stream_reading/change_handler.py:77-81`: sum of
  * the key's bytes modulo the number of producers). Implemented as a
  * native Catalyst expression with codegen so it stays inside
  * whole-stage codegen on the hot path (a Scala UDF would break the
  * codegen span and add ser/de per row).
  */
case class ByteSumModExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
    (s % n).toInt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val s = ctx.freshName("sum")
      val i = ctx.freshName("i")
      s"""
         |byte[] $b = $c.getBytes();
         |long $s = 0L;
         |for (int $i = 0; $i < $b.length; $i++) { $s += ($b[$i] & 0xff); }
         |${ev.value} = (int)($s % $n);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteSumModExpr =
    copy(child = newChild)
}

/** Polynomial rolling-hash document fingerprint:
  * h = fold(h * 31 + byte) mod 1e9+7 over the string's UTF-8 bytes.
  * The modulus keeps every intermediate inside an int64 so the exact
  * same arithmetic is expressible in ANSI SQL (the DuckDB oracle uses
  * list_reduce with identical constants). Codegen'd for the hot path.
  */
case class FingerprintExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  final val Mod = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31L + (bytes(i) & 0xff)) % Mod; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $b = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h = ($h * 31L + ($b[$i] & 0xff)) % ${Mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
}

object ByteSumMod {
  def apply(c: Column, n: Int): Column =
    toColumn(ByteSumModExpr(toExpression(c), n))
}

object Fingerprint {
  def apply(c: Column): Column =
    toColumn(FingerprintExpr(toExpression(c)))
}
