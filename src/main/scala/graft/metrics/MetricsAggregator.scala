package graft.metrics

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed single-pass confusion-matrix aggregator (SURVEY §7.3: the optional
  * `Aggregator[IN,BUF,OUT]` form of G4). Same counts/ratios as
  * [[Metrics.confusionMetrics]] — MetricsSpec asserts agreement — but usable
  * with `Dataset[(String, String)].select(MetricsAggregator.toColumn)` and
  * inside `KeyValueGroupedDataset.agg` for per-task metrics in one pass.
  */
object MetricsAggregator {

  final case class Counts(
      total: Long, crc: Long, tp: Long, fn: Long, tn: Long, fp: Long)

  final case class Result(
      total: Long, crc: Long, tp: Long, fn: Long, tn: Long, fp: Long,
      prec: Double, rec: Double, acc: Double, f1Legacy: Double, f1: Double)

  /** (pred, gold) pairs → metrics, tolerant equality per row. */
  def apply(tol: Double = 0.021, truncating: Boolean = true)
      : Aggregator[(String, String), Counts, Result] =
    new Aggregator[(String, String), Counts, Result] {

      override def zero: Counts = Counts(0, 0, 0, 0, 0, 0)

      override def reduce(b: Counts, row: (String, String)): Counts = {
        val (pred, gold) = row
        val crc = TolerantEq.eval(
          org.apache.spark.unsafe.types.UTF8String.fromString(pred),
          org.apache.spark.unsafe.types.UTF8String.fromString(gold),
          tol, truncating)
        val g = Option(gold).getOrElse("").trim.toLowerCase
        Counts(
          b.total + 1,
          b.crc + (if (crc) 1 else 0),
          b.tp + (if (g == "yes" && crc) 1 else 0),
          b.fn + (if (g == "yes" && !crc) 1 else 0),
          b.tn + (if (g == "no" && crc) 1 else 0),
          b.fp + (if (g == "no" && !crc) 1 else 0))
      }

      override def merge(a: Counts, b: Counts): Counts =
        Counts(a.total + b.total, a.crc + b.crc, a.tp + b.tp,
          a.fn + b.fn, a.tn + b.tn, a.fp + b.fp)

      // Same HALF_UP-at-6-decimals rounding as Catalyst's round() so the
      // typed form agrees bit-for-bit with Metrics.confusionMetrics.
      private def round6(x: Double): Double =
        BigDecimal.valueOf(x)
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

      override def finish(c: Counts): Result = {
        val prec = round6(c.tp.toDouble / math.max(1L, c.tp + c.fp))
        val rec = round6(c.tp.toDouble / math.max(1L, c.tp + c.fn))
        val acc = round6(if (c.total == 0) 0.0 else c.crc.toDouble / c.total)
        val f1Legacy = round6(2.0 * prec * rec / math.max(1.0, prec + rec))
        val f1 = round6(
          if (prec + rec > 0.0) 2.0 * prec * rec / (prec + rec) else 0.0)
        Result(c.total, c.crc, c.tp, c.fn, c.tn, c.fp,
          prec, rec, acc, f1Legacy, f1)
      }

      override def bufferEncoder: Encoder[Counts] = Encoders.product[Counts]
      override def outputEncoder: Encoder[Result] = Encoders.product[Result]
    }
}
