package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` packaging of the compound return (SURVEY §7.3) for
  * `Dataset`-API ergonomics:
  *
  * {{{
  * ds.groupByKey(_.fundCode).agg(CompoundReturnAgg.toColumn)
  * }}}
  *
  * Identical semantics to the composed-built-ins form
  * `exp(sum(ln(1+r)))-1` in [[ReturnFunctions.compoundReturn]]: NULL
  * (None) returns contribute factor 1.0; an all-None group yields None.
  * The buffer (sum of logs, non-null count) is associative and
  * commutative, so Spark performs map-side partial aggregation — the
  * property that matters at 100 TB.
  */
object CompoundReturnAgg
    extends Aggregator[Option[Double], (Double, Long), Option[Double]] {

  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), r: Option[Double]): (Double, Long) =
    r match {
      case Some(v) => (b._1 + math.log(1.0 + v), b._2 + 1)
      case None => b
    }

  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Double, Long)): Option[Double] =
    if (b._2 == 0L) None else Some(math.exp(b._1) - 1.0)

  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)

  override def outputEncoder: Encoder[Option[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
