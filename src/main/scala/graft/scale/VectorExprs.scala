package graft.scale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Tight-loop vector kernels behind [[VectorBinaryExpr]], callable from both
  * interpreted eval and generated code. Boxed returns so "vectors of unequal
  * length" and "null element" yield SQL NULL — the exact semantics of the
  * `aggregate(zip_with(...))` higher-order form these kernels replace
  * (ScaleSpec asserts agreement).
  */
object VectorOps {

  def dotLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  def dotDouble(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Float inputs: multiply in float THEN accumulate in double — the same
    * promotion order as `zip_with` (float product array) + `aggregate`
    * (double fold), so results are bit-identical to the HOF form.
    */
  def dotFloat(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += (a.getFloat(i) * b.getFloat(i)).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  def l2SqLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  def l2SqDouble(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  def l2SqFloat(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getFloat(i) - b.getFloat(i)
      s += (d * d).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

object VectorBinaryExpr {
  sealed trait Op { def name: String }
  case object Dot extends Op { val name = "dot" }
  case object L2Sq extends Op { val name = "l2Sq" }
}

/** Native codegen'd vector reduction (dot product / squared L2) over two
  * array columns. The higher-order formulation
  * (`aggregate(zip_with(a, b, …), 0, …)`) evaluates its lambdas INTERPRETED
  * — two allocations plus per-element closure dispatch per row, outside
  * whole-stage codegen. This expression is one virtual call into a tight
  * primitive loop that stays inside the codegen stage — the difference is
  * the hot path of every ANN / near-dup / k-means operator at scale.
  *
  * Element types: long (quantized path, exact integer math), double, float
  * (float multiplies, double accumulate — HOF promotion order). Unequal
  * lengths or null elements → NULL, matching the HOF form.
  */
case class VectorBinaryExpr(
    left: Expression,
    right: Expression,
    op: VectorBinaryExpr.Op)
  extends BinaryExpression {

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if lt == rt &&
            (lt == LongType || lt == DoubleType || lt == FloatType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"${op.name} expects two arrays of the same long/double/float " +
          s"element type, got (${left.dataType.simpleString}, " +
          s"${right.dataType.simpleString})")
    }

  override def dataType: DataType =
    if (elemType == LongType) LongType else DoubleType

  override def nullable: Boolean = true

  private def method: String = (op, elemType) match {
    case (VectorBinaryExpr.Dot, LongType)   => "dotLong"
    case (VectorBinaryExpr.Dot, FloatType)  => "dotFloat"
    case (VectorBinaryExpr.Dot, _)          => "dotDouble"
    case (VectorBinaryExpr.L2Sq, LongType)  => "l2SqLong"
    case (VectorBinaryExpr.L2Sq, FloatType) => "l2SqFloat"
    case (VectorBinaryExpr.L2Sq, _)         => "l2SqDouble"
  }

  // resolved once, not per interpreted-eval row
  @transient private lazy val kernel: (ArrayData, ArrayData) => Any =
    method match {
      case "dotLong"    => VectorOps.dotLong
      case "dotFloat"   => VectorOps.dotFloat
      case "dotDouble"  => VectorOps.dotDouble
      case "l2SqLong"   => VectorOps.l2SqLong
      case "l2SqFloat"  => VectorOps.l2SqFloat
      case "l2SqDouble" => VectorOps.l2SqDouble
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.scale.VectorOps$.MODULE$"
    val boxed =
      if (dataType == LongType) "java.lang.Long" else "java.lang.Double"
    val unbox = if (dataType == LongType) "longValue" else "doubleValue"
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val tmp = ctx.freshName("vecRes")
      s"""
        $boxed $tmp = ($boxed) $helper.$method($l, $r);
        if ($tmp == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $tmp.$unbox();
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
