package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic column builders shared by every query in the engine.
  *
  * Why this exists: at cluster scale Spark's partial aggregation order is
  * nondeterministic, so `sum(double)` can differ bit-for-bit between runs and
  * between engines. Every money/metric aggregate therefore goes through exact
  * decimal arithmetic (order-independent) or a single IEEE double operation on
  * exact operands followed by an explicit `round` + decimal cast. This is what
  * makes results hash-comparable against a DuckDB oracle *and* stable across
  * re-partitions / AQE re-plans on a real cluster.
  *
  * Reference parity: the reference stores money as DECIMAL(10,2) and rates as
  * DECIMAL(5,2) (/root/reference/db/init.sql:31,46); we standardize on
  * DECIMAL(18,2) / DECIMAL(18,4) which contain those ranges at 100 TB row
  * counts without overflow.
  */
object Cols {
  /** Cast a double to DECIMAL(18,2) *before* aggregation — exact from there on. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent exact sum of a money-like double column. */
  def sumDec2(c: Column): Column = sum(dec2(c)).cast(DecimalType(18, 2))

  /** Conditional revenue-style sum (reference A3,
    * streaming_processor.py:289): exact decimal, 0.00 when no match. */
  def sumDec2When(cond: Column, c: Column): Column =
    sum(when(cond, dec2(c)).otherwise(dec2(lit(0)))).cast(DecimalType(18, 2))

  /** Conditional count (reference A2, streaming_processor.py:179-181). */
  def countWhen(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))

  /** Quantize a double to 4 decimals, toward -∞: floor(x·10⁴)/10⁴.
    *
    * Why floor and not round: both engines compute the same IEEE double x,
    * and `x * 10000.0` is again one identical IEEE op — so floor of it is
    * bit-deterministic across engines. `round(x, 4)` is NOT: Spark rounds
    * the exact binary expansion of x while other engines re-round via a
    * double multiply, and the two disagree whenever x·10⁴ straddles a .5
    * (observed in practice ~1/100 rows on ratio-heavy data).
    * Range contract: |x|·10⁴ must stay below 2^53 (true for all ratios,
    * cosines and money averages this engine emits). */
  def q4(x: Column): Column =
    (floor(x * 10000.0).cast(DecimalType(18, 4)) / 10000).cast(DecimalType(18, 4))

  /** Percentage ratio with divide-by-zero guard (reference A9,
    * streaming_processor.py:298-303): num*100.0/den in one double division
    * over exact operands, floor-quantized to a fixed decimal. */
  def pct4(num: Column, den: Column): Column =
    when(den > 0, q4(num.cast("double") * 100.0 / den.cast("double")))
      .otherwise(lit(0).cast(DecimalType(18, 4)))

  /** Deterministic average: exact sum / exact count, single double division,
    * floor-quantized. */
  def avg4(sumCol: Column, cnt: Column): Column =
    when(cnt > 0, q4(sumCol.cast("double") / cnt.cast("double")))
      .otherwise(lit(0).cast(DecimalType(18, 4)))

  /** Quantize a per-row double expression to a fixed decimal (see [[q4]]). */
  def asDec4(c: Column): Column = q4(c)

  /** Epoch seconds of a genuine (µs/ms) timestamp column. Session TZ is UTC,
    * so NTZ wall-clock == epoch-as-UTC, matching a naive-timestamp oracle. */
  def tsSec(c: Column): Column = unix_timestamp(c.cast("timestamp"))

  /** Epoch seconds of the enclosing hour, from an epoch-seconds long column
    * (tumbling 1h window key, reference T2 streaming_processor.py:281
    * `window(timestamp, "1 hour")`). Integral arithmetic: ts_sec ≈ 1.7e9 is
    * exact in double, so floor(x/3600)*3600 is exact. */
  def hourSec(tsSecCol: Column): Column =
    (floor(tsSecCol / 3600.0) * 3600).cast("long")
}
