package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared expression helpers.
  *
  * Oracle-parity note (SURVEY.md §7.3.1): the driver hash-compares our
  * results against DuckDB. Floating-point SUM/AVG over different addition
  * orders diverges in the low bits, and engine `round()` implementations
  * disagree on ties, so every money/measure aggregate here is quantized
  * ELEMENT-WISE to an integer (`floor(x * 10^s + 0.5)` — pure IEEE ops that
  * both engines evaluate bit-identically), summed exactly as BIGINT, and
  * only then divided back. The division (`long / 10^s.toDouble`) is a single
  * IEEE op on identical inputs → identical doubles on both sides.
  */
object Fx {
  /** Element-wise quantization of a double column to integer units
    * (s=2 → cents). SQL equivalent: CAST(FLOOR(x*100 + 0.5) AS BIGINT). */
  def toUnits(c: Column, s: Int = 2): Column =
    floor(c * math.pow(10, s) + lit(0.5)).cast("long")

  /** Exact money sum: quantize each element, sum as long, scale back.
    *
    * Overflow headroom: the long accumulator wraps silently past 2^63.
    * At s=4 a ~1e5-valued measure quantizes to ~1e9 units/row, so a
    * single group can absorb ~9e9 rows (Long.MaxValue / 1e9) before
    * wrapping — safe through ~1 TB-scale groups, NOT safe for a 100 TB
    * single-group sum (~1e11 rows). Callers aggregating beyond that
    * bound must use [[moneySumWide]], which accumulates in
    * DECIMAL(38,0) (no wrap; ~10^38 headroom) at ~2× agg cost. */
  def moneySum(c: Column, s: Int = 2): Column =
    sum(toUnits(c, s)) / math.pow(10, s)

  /** Overflow-safe money sum for very large groups: quantizes element-wise
    * exactly like [[moneySum]] but sums as DECIMAL(38,0), trading ~2× agg
    * cost for ~10^38 headroom. Result differs from moneySum only when the
    * long path would have wrapped (i.e. when moneySum is wrong). */
  def moneySumWide(c: Column, s: Int = 2): Column =
    (sum(toUnits(c, s).cast("decimal(38,0)")).cast("double") /
      math.pow(10, s))

  /** SQL twin of [[moneySumWide]]: DuckDB's SUM(BIGINT) already
    * accumulates in HUGEINT (128-bit — the wide accumulator), so the
    * twin is just cast-to-double then the same single IEEE division.
    * Sums below 2^53 units convert exactly, above that both engines
    * round-to-nearest identically. */
  def sqlMoneySumWide(x: String, s: Int = 2): String =
    s"(CAST(SUM(${sqlUnits(x, s)}) AS DOUBLE) / 1e$s)"

  /** Exact money avg: integer sum divided by count — both engines perform
    * the same two IEEE divisions on identical integers. */
  def moneyAvg(c: Column, s: Int = 2): Column =
    (sum(toUnits(c, s)) / math.pow(10, s)) / count(lit(1))

  /** SQL-side equivalents (kept adjacent so the pair stays in sync).
    * DuckDB SUM(BIGINT) yields HUGEINT — cast back to BIGINT so the
    * division input types match Spark's long/double. */
  def sqlUnits(x: String, s: Int = 2): String =
    s"CAST(FLOOR(($x) * 1e$s + 0.5) AS BIGINT)"
  def sqlUnitSum(x: String, s: Int = 2): String =
    s"CAST(SUM(${sqlUnits(x, s)}) AS BIGINT)"
  def sqlMoneySum(x: String, s: Int = 2): String =
    s"(${sqlUnitSum(x, s)} / 1e$s)"
  def sqlMoneyAvg(x: String, s: Int = 2): String =
    s"((${sqlUnitSum(x, s)} / 1e$s) / COUNT(*))"
}
