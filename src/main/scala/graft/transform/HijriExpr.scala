package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DateType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel behind [[GregorianToHijriExpr]], callable from interpreted eval
  * and generated code. One linear pass of integer arithmetic per row — the
  * composed-`Column` form of the same tabular-calendar algorithm duplicates
  * every `val` reference into the expression tree (each of `l1`/`j`/`l2` is
  * referenced 2-4× downstream), which compounds to dozens of copies of the
  * timestamp parse per row and a codegen blowup (measured 0.9 s → 13.3 s on
  * `transform_geo_part` at sf0.1).
  */
object HijriDays {
  /** Tabular Islamic (civil) date `yyyy-MM-dd` for a Gregorian date given
    * as days since 1970-01-01 (Spark DateType's physical value; proleptic
    * Gregorian, so `epochDay + 2440588` IS the JDN the y/m/d formula in
    * [[TransformProgram.GregorianToHijri.eval]] computes). Pre-epoch dates
    * (JDN < 1948440, i.e. before 1 Muharram 1 AH) → "". All intermediates
    * are non-negative on the guarded domain, so truncating `/` equals the
    * floor division the per-row eval uses.
    */
  def eval(epochDay: Int): UTF8String = {
    val jdn = epochDay.toLong + 2440588L
    if (jdn < 1948440L) return UTF8String.fromString("")
    val l0 = jdn - 1948440L + 10632L
    val n = (l0 - 1L) / 10631L
    val l1 = l0 - n * 10631L + 354L
    val j = (10985L - l1) / 5316L * (l1 * 50L / 17719L) +
      l1 / 5670L * (l1 * 43L / 15238L)
    val l2 = l1 - (30L - j) / 15L * (j * 17719L / 50L) -
      j / 16L * (j * 15238L / 43L) + 29L
    val hm = l2 * 24L / 709L
    val hd = l2 - hm * 709L / 24L
    val hy = n * 30L + j - 30L
    UTF8String.fromString(f"$hy%04d-$hm%02d-$hd%02d")
  }
}

/** Codegen'd Gregorian→tabular-Hijri conversion over a DateType input.
  * Stays inside whole-stage codegen; agreement with the per-row
  * [[TransformProgram.GregorianToHijri.eval]] is property-tested
  * (TransformSpec `agree`).
  */
case class GregorianToHijriExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DateType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gregorian_to_hijri expects date input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    HijriDays.eval(input.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.transform.HijriDays.eval($c)")

  override protected def withNewChildInternal(
      newChild: Expression): GregorianToHijriExpr = copy(child = newChild)
}

object HijriExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Tabular Hijri date string for a DateType column (null in → null out;
    * callers coalesce to the DSL's "" convention).
    */
  def gregorianToHijri(date: Column): Column =
    ColumnBridge.column(GregorianToHijriExpr(ColumnBridge.expression(date)))
}
