package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, composed
  * from Spark's higher-order functions (`zip_with`/`aggregate`) so the
  * arithmetic stays inside codegen — no UDF deserialization per row.
  *
  * All accumulation is in DOUBLE (elements are cast before multiply):
  * float accumulation over 64+ elements loses ~1e-5 relative precision,
  * which would break cross-engine verification and ranking stability.
  */
object VectorFunctions {

  /** Element-wise cast to double. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product with double accumulation, left-to-right — a codegen'd
    * custom Expression (see [[graft.expressions.DotProduct]]); identical
    * arithmetic to the higher-order-function fold, ~50x faster on
    * pairwise workloads because the loop stays primitive. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.DotProduct(a, b)

  /** The composed-built-ins fold form (kept as the semantic reference;
    * asserted equal to [[dot]] in VectorFunctionsSpec). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean (L2) norm. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared Euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }), lit(0.0), (acc, v) => acc + v)
}
