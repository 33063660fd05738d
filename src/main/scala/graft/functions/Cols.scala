package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic column builders shared by every query in the engine.
  *
  * Why this exists: at cluster scale Spark's partial aggregation order is
  * nondeterministic, so `sum(double)` can differ bit-for-bit between runs and
  * between engines. Every money/metric aggregate therefore goes through exact
  * integer (cents) arithmetic — order-independent — and every ratio through a
  * single IEEE double operation on exact operands followed by floor
  * quantization. This makes results hash-comparable against a DuckDB oracle
  * *and* stable across re-partitions / AQE re-plans on a real cluster.
  *
  * Output-type contract: every non-integral result column is a DOUBLE whose
  * bits are reproducible on any engine executing the same op sequence
  * (exact integer → one or two IEEE divides). Doubles — unlike decimals —
  * also *render* identically under every consumer (Arrow, pandas, DuckDB),
  * so a string/hash compare of results is representation-independent.
  * Decimals are used only as an intermediate to read 2-decimal money doubles
  * exactly; they never appear in an output schema.
  *
  * Reference parity: the reference stores money as DECIMAL(10,2) and rates as
  * DECIMAL(5,2) (/root/reference/db/init.sql:31,46); cents-longs contain those
  * ranges exactly up to 2^53 cents (~90 trillion dollars) — ample at 100 TB
  * row counts — and aggregate faster than decimals (single-word adds).
  */
object Cols {
  /** Cast a 2-decimal money double to DECIMAL(18,2) — exact by data contract. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact integer cents of a 2-decimal money double. dec2(c)*100 is
    * integral, so the long cast is exact; from here every aggregate is
    * order-independent 64-bit integer arithmetic. */
  def cents(c: Column): Column = (dec2(c) * 100).cast("long")

  /** Order-independent exact sum of a money-like double column, rendered as
    * a double: exact cents sum, then one IEEE divide (exact for sums below
    * 2^53 cents). */
  def sumDec2(c: Column): Column = sum(cents(c)).cast("double") / 100.0

  /** Conditional revenue-style sum (reference A3,
    * streaming_processor.py:289): exact cents, 0.0 when no match. */
  def sumDec2When(cond: Column, c: Column): Column =
    sum(when(cond, cents(c)).otherwise(0L)).cast("double") / 100.0

  /** Exact sum of a scale-4 decimal product (money × ratio, e.g.
    * price·(1−discount)): the product is integral in 1e-4 units, summed as
    * longs, rendered with one IEEE divide. */
  def sumDec4(prod: Column): Column =
    sum((prod * 10000).cast("long")).cast("double") / 10000.0

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
    * Spark's floor returns a long; long→double is exact below 2^53, and the
    * final divide is one more shared IEEE op — so the result bits equal any
    * engine's floor(x*10000.0)/10000.0.
    * Range contract: |x|·10⁴ must stay below 2^53 (true for all ratios,
    * cosines and money averages this engine emits). */
  def q4(x: Column): Column = floor(x * 10000.0).cast("double") / 10000.0

  /** Percentage ratio with divide-by-zero guard (reference A9,
    * streaming_processor.py:298-303): num*100.0/den in one double division
    * over exact operands, floor-quantized. */
  def pct4(num: Column, den: Column): Column =
    when(den > 0, q4(num.cast("double") * 100.0 / den.cast("double")))
      .otherwise(lit(0.0))

  /** Deterministic average: exact sum (already rendered double) / exact
    * count, single double division, floor-quantized. */
  def avg4(sumCol: Column, cnt: Column): Column =
    when(cnt > 0, q4(sumCol.cast("double") / cnt.cast("double")))
      .otherwise(lit(0.0))

  /** Floor-quantized mean of a 2-decimal money column: exact cents sum, then
    * two IEEE divides (/100.0, /count) mirrored verbatim in the oracle. */
  def avgMoney4(c: Column, cnt: Column): Column =
    when(cnt > 0, q4(sum(cents(c)).cast("double") / 100.0 / cnt.cast("double")))
      .otherwise(lit(0.0))

  /** Quantize a per-row double expression (see [[q4]]). */
  def asDec4(c: Column): Column = q4(c)

  /** Epoch seconds of a genuine (µs/ms) timestamp column. Session TZ is UTC,
    * so NTZ wall-clock == epoch-as-UTC, matching a naive-timestamp oracle. */
  def tsSec(c: Column): Column = unix_timestamp(c.cast("timestamp"))

  /** Pinned cross-engine Unicode case fold for the tokenizer/fingerprint
    * paths — the explicit normalization step COVERAGE's round-12 probe
    * prescribed ("pin NFC + casefold ahead of tokenization rather than
    * rely on any engine's incidental lower()"). Plain `lower()` is
    * engine-defined on a handful of classes: Spark/Java maps 'İ' → i +
    * combining dot and applies the Greek final-sigma context rule, while
    * DuckDB/utf8proc maps 'İ' → plain i and Σ → σ unconditionally — so a
    * Unicode corpus hash-diverges even when both engines are "right".
    * The fold substitutes the divergent classes FIRST (İ/ı → i, Σ/ς → σ,
    * ß/ẞ → ss — the full-casefold forms, applied with plain
    * non-overlapping `replace`/codepoint `translate`, identical semantics
    * in both engines), then lowercases: after the substitution neither
    * engine's context rules have anything left to disagree on.
    *
    * The r15 BMP completeness sweep (`tools.FoldSweep` ×
    * `tools/foldcase_sweep.py`: every U+0020..U+FFFF codepoint, bare and
    * in letter context, both engines on the identical chain) found 13
    * further divergent codepoints — ALL Unicode-version skew, where JDK
    * 17 (Unicode 13+) knows a case pair that DuckDB's utf8proc tables
    * predate, so Java lowercases and DuckDB passes through: Cyrillic
    * TJE U+1C89, Glagolitic CAUDATE CHRIVI U+2C2F, and eleven Latin
    * Extended-D capitals (OLD POLISH O U+A7C0, D/S WITH SHORT STROKE
    * OVERLAY U+A7C7/U+A7C9, RAMS HORN U+A7CB, C WITH PALATAL HOOK
    * U+A7CC, CLOSED INSULAR G U+A7D0, MIDDLE SCOTS S U+A7D6, SIGMOID S
    * U+A7D8, LAMBDA U+A7DA, LAMBDA WITH STROKE U+A7DC, REVERSED HALF H
    * U+A7F5). Each is pre-substituted capital → its JDK lowercase in the
    * translate below, after which `lower()` is a no-op on the class in
    * BOTH engines. The probed classes the r12 audit found (İıΣςßẞ) keep
    * their original slots. Sweep artifact: `foldsweep_r15.json` (0
    * remaining divergences, 126 912 rows). Ligatures ﬁ/ﬂ do NOT diverge
    * (neither engine decomposes on lower() — full-casefold-only
    * mappings stay out of scope by design). On pure
    * ASCII every step is a no-op, so ASCII corpora are bit-identical to
    * raw `lower()`. The oracle mirrors the exact chain
    * (`lower(translate(replace(replace(x,'ß','ss'),'ẞ','ss'),'İıΣςᲉⰯꟀꟇꟉꟋꟌꟐꟖꟘꟚꟜꟵ','iiσσᲊⱟꟁꟈꟊɤꟍꟑꟗꟙꟛƛꟶ'))`).
    * All replace/translate/lower steps are codegen'd Catalyst
    * expressions — the fold stays inside WholeStageCodegen on the scan. */
  def foldCase(c: Column): Column =
    lower(translate(
      replace(replace(c, lit("ß"), lit("ss")), lit("ẞ"), lit("ss")),
      "İıΣςᲉⰯꟀꟇꟉꟋꟌꟐꟖꟘꟚꟜꟵ", "iiσσᲊⱟꟁꟈꟊɤꟍꟑꟗꟙꟛƛꟶ"))

  /** Epoch seconds of the enclosing hour, from an epoch-seconds long column
    * (tumbling 1h window key, reference T2 streaming_processor.py:281
    * `window(timestamp, "1 hour")`). Integral arithmetic: ts_sec ≈ 1.7e9 is
    * exact in double, so floor(x/3600)*3600 is exact. */
  def hourSec(tsSecCol: Column): Column =
    (floor(tsSecCol / 3600.0) * 3600).cast("long")
}
