package graft.scale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Kernel behind [[Md5PrefixLongExpr]], callable from interpreted eval and
  * generated code. Thread-local digest instance: `MessageDigest.getInstance`
  * per row is what Spark's own Md5 expression pays — skipping it AND the
  * 32-char hex materialization + base-16 reparse is the whole point.
  */
object Md5Prefix {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** For hexChars ≤ 15: EXACTLY the value of
    * `conv(substring(md5(x), 1, hexChars), 16, 10).cast("long")` — the
    * repo's portable-hash convention — computed from the digest bytes
    * directly (big-endian prefix; odd counts drop the final low nibble).
    * For hexChars = 16 the value is the SIGNED 64-bit reading of the
    * first 8 digest bytes (bijective with the 8-byte binary prefix key,
    * so valid for grouping/joining; NOT the conv value, which overflows
    * a signed long).
    */
  def eval(bytes: Array[Byte], hexChars: Int): Long = {
    val md = tl.get()
    md.reset()
    val d = md.digest(bytes)
    val nBytes = (hexChars + 1) / 2
    var v = 0L
    var i = 0
    while (i < nBytes) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    if ((hexChars & 1) == 1) v >>>= 4
    v
  }
}

/** Codegen'd md5-prefix-to-long: the portable-hash convention
  * (`Samplers.hashDraw32`, the simhash per-token hash, the substring-dedup
  * window key) as ONE expression over the input bytes. The composed
  * built-in form — `md5` (digest + hex-encode) → `substring` (copy) →
  * `conv` (base-16 string parse) — allocates a 32-char hex string and
  * reparses it per row; this expression reads the digest bytes directly
  * and stays inside whole-stage codegen (PlanSpec-asserted). Value
  * contract documented on [[Md5Prefix.eval]]; agreement with the composed
  * form is property-tested.
  */
case class Md5PrefixLongExpr(child: Expression, hexChars: Int)
    extends UnaryExpression {
  require(hexChars >= 1 && hexChars <= 16,
    s"hexChars must be in [1, 16], got $hexChars")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_prefix_long expects binary input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix.eval(input.asInstanceOf[Array[Byte]], hexChars)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.scale.Md5Prefix.eval($c, $hexChars)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5PrefixLongExpr = copy(child = newChild)
}

object HashExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** First `hexChars` hex chars of md5(input) as a long (see
    * [[Md5Prefix.eval]] for the exact contract). Input column must be
    * binary (callers cast, matching the composed form's explicit casts).
    */
  def md5PrefixLong(c: Column, hexChars: Int): Column =
    ColumnBridge.column(
      Md5PrefixLongExpr(ColumnBridge.expression(c), hexChars))
}
