package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Helpers shared by the oracle-compared query groups. */
package object queries {

  /** Engine-deterministic rounding: floor(x·10^s + 0.5)/10^s.
    *
    * Builtin round() is NOT cross-engine-safe on exact decimal ties: Spark
    * rounds the shortest decimal representation (BigDecimal.valueOf →
    * HALF_UP) while DuckDB rounds the binary double (std::round), so e.g.
    * an exact 42.38625 rounds to 42.3863 in Spark and 42.3862 in DuckDB.
    * This formulation is plain IEEE arithmetic — identical in any engine
    * given identical inputs, and identical-by-construction inputs are what
    * the cents-exact aggregation helpers (TimeSeries.smaCents) provide.
    * floor() yields Long in Spark and Double in DuckDB; the final division
    * converges both to the same double. */
  def rnd(c: Column, s: Int): Column = {
    val p = math.pow(10, s)
    floor(c * p + 0.5) / p
  }

  /** DuckDB twin of [[rnd]]. */
  def rndSql(e: String, s: Int): String =
    s"floor(($e) * 1e$s + 0.5) / 1e$s"
}
