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

/** Kernel behind [[AnchoredWindowHashExpr]]: one char scan per document,
  * one md5 per word-start-anchored k-char window — the fused form of
  * `regexp_extract_all(text, "(?<![^ ])(?=([\s\S]{k}))", 1)` → explode →
  * `md5PrefixLong(window, 16)`. The regex engine pays a lookbehind test
  * and a k-char capture allocation at every position; this loop tests one
  * char and hashes only at anchors (profiled ~7× cheaper at sf0.1·8 —
  * the regex scan was 85% of substringDupPairs' runtime).
  */
object AnchoredWindows {
  def hashes(text: String, k: Int): Array[Long] = {
    val len = text.length
    if (len < k)
      return Array(Md5Prefix.eval(
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8), 16))
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    out.sizeHint(len / 6 + 1)
    var i = 0
    while (i <= len - k) {
      if (i == 0 || text.charAt(i - 1) == ' ')
        out += Md5Prefix.eval(text.substring(i, i + k)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8), 16)
      i += 1
    }
    out.result()
  }
}

/** Codegen'd anchored-window hash array: emits, per document, the
  * [[Md5Prefix]]-16 key of every word-start-anchored k-char window (the
  * whole text as the single window for sub-k docs) — exactly the window
  * set [[graft.scale.Dedup.substringDupPairs]] documents, with the window
  * STRINGS never materialized into the plan: the explode downstream
  * carries 8-byte longs, not 48-char strings. Agreement with the composed
  * regex + md5PrefixLong form is property-tested (PropertiesSpec).
  */
case class AnchoredWindowHashExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"window length must be positive, got $k")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"anchored_window_hashes expects string input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      AnchoredWindows.hashes(input.toString, k))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.scale.AnchoredWindows.hashes($c.toString(), $k))")

  override protected def withNewChildInternal(
      newChild: Expression): AnchoredWindowHashExpr = copy(child = newChild)
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

  /** Array of [[Md5Prefix]]-16 window keys for every word-start-anchored
    * k-char window of a string column (see [[AnchoredWindowHashExpr]]).
    */
  def anchoredWindowHashes(c: Column, k: Int): Column =
    ColumnBridge.column(
      AnchoredWindowHashExpr(ColumnBridge.expression(c), k))
}
