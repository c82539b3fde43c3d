package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType, ShortType}

/** Native codegen'd integer dot product over two integral arrays — the hot
  * inner loop of SQ8 quantized similarity ranking (Similarity.sq8TopK).
  * Same preference-ladder argument as [[CosineSimilarity]]: a doGenCode
  * while-loop beats zip_with+aggregate, which builds an intermediate
  * product array per comparison and evaluates its lambdas outside
  * whole-stage codegen (measured on the x31 ranking join: 3.15 s -> sub-x9
  * with the expression).
  *
  * Result is LongType and EXACT: int8 codes bound each product by 2^14, so
  * a 2^49-element array can't overflow — overflow is a non-issue at any
  * real embedding width. Sequential left-to-right fold over the common
  * prefix, NULL if either side is NULL — identical semantics to the
  * zip_with+aggregate form it replaces (spec-pinned), and exactly
  * representable in the DuckDB oracle's double-list inner product.
  */
case class Int8Dot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean  = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(ByteType | ShortType | IntegerType | LongType, _) => true
      case _                                                           => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"int8_dot expects two integral arrays, got ${left.dataType} / ${right.dataType}")
  }

  private def elemType(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (tx, ty) = (elemType(left), elemType(right))
    val n        = math.min(xs.numElements(), ys.numElements())
    var dot = 0L; var i = 0
    while (i < n) {
      dot += toLong(xs, i, tx) * toLong(ys, i, ty)
      i += 1
    }
    dot
  }

  private def toLong(arr: ArrayData, i: Int, t: DataType): Long = t match {
    case ByteType    => arr.getByte(i).toLong
    case ShortType   => arr.getShort(i).toLong
    case IntegerType => arr.getInt(i).toLong
    case LongType    => arr.getLong(i)
    case other       => throw new IllegalStateException(s"int8_dot: unreachable element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (tx, ty) = (elemType(left), elemType(right))
    def get(arr: String, i: String, t: DataType): String = t match {
      case ByteType    => s"(long) $arr.getByte($i)"
      case ShortType   => s"(long) $arr.getShort($i)"
      case IntegerType => s"(long) $arr.getInt($i)"
      case LongType    => s"$arr.getLong($i)"
      case other       => throw new IllegalStateException(s"int8_dot: unreachable element type $other")
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${get(a, i, tx)} * ${get(b, i, ty)};
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Int8Dot {
  /** Column form. */
  def int8_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(Int8Dot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
