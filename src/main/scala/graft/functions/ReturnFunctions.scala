package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Geometric-linking ("compounded return") aggregates.
  *
  * The reference's domain-defining computation (reference
  * `mkt_returns/sql_test_mkt_returns.ipynb:683-692,789-799`):
  *
  *   compound(r_1..r_n) = exp(sum(ln(1 + r_i))) - 1
  *
  * Null semantics are load-bearing: a NULL return contributes factor 1.0
  * (a 0% day) because `ln(1+NULL)` is NULL and `sum` skips NULLs; a group
  * that is ALL NULL yields NULL (sum of no rows is NULL). Spark's
  * `sum`/`log` agree with the reference's engines — asserted in
  * ReturnFunctionsSpec, not assumed.
  *
  * Composed from built-ins (codegen'd, partial-aggregatable: `sum` gets
  * map-side combine for free) rather than a UDAF — at 100 TB the partial
  * aggregation matters far more than packaging.
  */
object ReturnFunctions {

  /** ln(1+r). `log1p` is more accurate for tiny r but differs from the
    * reference's literal `LN(1+r)` in the last ulp; we keep `ln(1+r)`
    * for oracle bit-parity and document the tradeoff. */
  def lnFactor(r: Column): Column = log(lit(1.0) + r)

  /** Aggregate: compounded return over a group. Use inside `.agg(...)`. */
  def compoundReturn(r: Column): Column = exp(sum(lnFactor(r))) - lit(1.0)

  /** Window: running compounded return ("daily compound evolution",
    * reference `.ipynb:789-799`). Pass a window with PARTITION BY the
    * entity keys and ORDER BY the time column; the default RANGE
    * UNBOUNDED PRECEDING..CURRENT ROW frame (identical in DuckDB and
    * Spark) makes same-date peers share the cumulative value. */
  def runningCompound(r: Column, w: WindowSpec): Column =
    exp(sum(lnFactor(r)).over(w)) - lit(1.0)
}
