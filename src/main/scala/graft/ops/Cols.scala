package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column expressions encoding the cross-engine determinism protocol
  * (SURVEY §5.3).
  *
  * Money rule learned in pre-flight: NEVER cast a *computed* double straight
  * to DECIMAL — Spark (BigDecimal-of-shortest-string, HALF_UP) and DuckDB
  * (binary scale-multiply) round half-cent boundaries differently
  * (23258.184999999998 → 23258.18 vs 23258.19). Instead recover the exact
  * 2-dp inputs as decimals FIRST, then use exact decimal arithmetic; keep
  * the full product scale (4 dp) so no rounding ever happens.
  */
object Cols {

  /** Exact 2-dp decimal view of a money/rate double column. */
  def dec2(c: Column): Column = c.cast("decimal(12,2)")

  /** revenue = extendedprice * (1 - discount), exact DECIMAL(18,4). */
  def revenue: Column =
    (dec2(col("l_extendedprice")) *
      (lit(1).cast("decimal(3,2)") - dec2(col("l_discount"))))
      .cast("decimal(18,4)")

  /** charge = extendedprice * (1 - discount) * (1 + tax), exact DECIMAL(18,6). */
  def charge: Column =
    (dec2(col("l_extendedprice")) *
      (lit(1).cast("decimal(3,2)") - dec2(col("l_discount"))) *
      (lit(1).cast("decimal(3,2)") + dec2(col("l_tax"))))
      .cast("decimal(18,6)")

  /** Deterministic average: exact decimal sum, one double division, 6 dp. */
  def avg6(c: Column): Column =
    round(sum(dec2(c)).cast("double") / count(c), 6)

  /** Per-JVM unique token for layout-query landing paths and table names
    * (ADVICE r2): two concurrent harnesses (Verify at two SFs, bench while
    * tests run) must never read each other's half-written sink output.
    * Stable within one JVM so repeated runs in a session overwrite the same
    * location instead of accumulating copies.
    */
  val runToken: String =
    java.lang.Long.toHexString(new java.security.SecureRandom().nextLong())

  /** Landing path under java.io.tmpdir, isolated by [[runToken]]. */
  def tmpPath(name: String): String =
    new java.io.File(sys.props("java.io.tmpdir"), s"${name}_$runToken")
      .getAbsolutePath
}
