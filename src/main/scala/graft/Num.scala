package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable numeric helpers (SURVEY.md §5).
  *
  * `round(x, k)` differs between engines in ALGORITHM (Spark rounds the
  * exact binary expansion via BigDecimal; DuckDB scales and rounds in
  * double space), so two engines can disagree on boundary-adjacent
  * doubles even when the input double is bit-identical.
  * `stableRound` = floor(x*10^k + 0.5)/10^k is the same double-op
  * sequence in any engine, so identical inputs give identical outputs.
  * Use it for narrow (non-aggregated) computations where both engines
  * compute the same input double; for aggregation results prefer
  * rounding at the scale where the true decimal value terminates.
  */
object Num {
  def stableRound(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** The same expression as DuckDB SQL text, for oracle strings. */
  def stableRoundSql(inner: String, scale: Int): String = {
    val p = "1" + "0" * scale
    s"floor(($inner)*$p + 0.5)/$p"
  }
}
