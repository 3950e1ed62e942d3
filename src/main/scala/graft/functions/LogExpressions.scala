package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DecimalType, LongType}

/** Fixed-point base-2 logarithm of a positive integer — the determinism
  * primitive behind the n-gram LM perplexity operators
  * ([[graft.operators.TextAnalysis.perplexityScore]]).
  *
  * Why not `log(...)`: per-token log-probabilities must SUM per document,
  * and float sums are order-dependent (and libm `log` differs in the last
  * ulp across engines), so a float formulation could never be replayed
  * hash-exact by an external SQL engine. This expression instead computes
  * `round-down(2^20 · log2(x))` with INTEGER arithmetic only — the
  * classic shift-and-square algorithm (Knuth TAOCP vol. 2 §4.2; also the
  * CORDIC-adjacent binary-logarithm construction):
  *
  *   e = floor(log2 x)                          (position of the top bit)
  *   m = x >> (e-20)  [or << (20-e) for e < 20]  (mantissa in [2^20, 2^21))
  *   repeat 20 times: m = (m·m) >> 20; emit bit 1 and halve iff m >= 2^21
  *
  * Every step is a shift/compare/multiply on longs, so ANY engine that
  * replays the recurrence (DuckDB: one recursive CTE — see the x135
  * oracle) lands on the IDENTICAL integer. The mantissa comes from
  * shifts in BOTH directions (never `x << 20`, which would overflow past
  * x = 2^43), so the domain is every positive long — at 100 TB a single
  * context word can carry ~2^41 occurrences and must not trip a range
  * guard. Exact at powers of two, error < 2^-19 elsewhere (two
  * truncations per iteration), monotone non-decreasing — all pinned in
  * LmSpec.
  *
  * Domain: x >= 1 (counts entering the LM scorer are +1-smoothed
  * positives; a violation means a corrupted count and throws loudly).
  */
object FixedLog2 {
  /** Fractional bits of the Q20 fixed-point result. */
  val FracBits = 20

  def log2q20(x: Long): Long = {
    if (x < 1L)
      throw new IllegalArgumentException(
        s"fixed_log2: input must be >= 1, got $x — counts entering the LM " +
          "scorer are +1-smoothed positives, so this means a corrupted count"
      )
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (e >= FracBits) x >> (e - FracBits) else x << (FracBits - e)
    var frac = 0L
    var j = 0
    while (j < FracBits) {
      val y = (m * m) >> FracBits
      if (y >= (1L << (FracBits + 1))) { frac = frac * 2 + 1; m = y >> 1 }
      else { frac = frac * 2; m = y }
      j += 1
    }
    (e.toLong << FracBits) + frac
  }

  /** [[log2q20]] widened to 128-bit inputs (Spark `DECIMAL(38,0)`) — the
    * SAME function: the recurrence only ever sees the top 21 bits of the
    * input (the mantissa `m = x >> (e-20)` truncates everything below),
    * so for any value that fits a long this returns exactly [[log2q20]]
    * (spec-pinned), and wider values extend the domain without changing
    * the grid. Needed by the Kneser–Ney scorer, whose interpolated-
    * probability NUMERATOR is a sum of count PRODUCTS (~2^90 at 100 TB
    * counts) that no long can carry. The DuckDB replay is the same
    * recursive CTE over HUGEINT — `>>` and the exponent ladder hold
    * verbatim, plus one 64-bit step on top. */
  def log2q20Dec(x: org.apache.spark.sql.types.Decimal): Long = {
    val b = x.toJavaBigDecimal.toBigIntegerExact
    if (b.signum < 1)
      throw new IllegalArgumentException(
        s"fixed_log2_dec: input must be >= 1, got $b — Kneser-Ney numerators are " +
          "positive by construction, so this means a corrupted count or a decimal overflow"
      )
    val e = b.bitLength - 1
    var m =
      if (e >= FracBits) b.shiftRight(e - FracBits).longValueExact
      else b.longValueExact << (FracBits - e)
    var frac = 0L
    var j = 0
    while (j < FracBits) {
      val y = (m * m) >> FracBits
      if (y >= (1L << (FracBits + 1))) { frac = frac * 2 + 1; m = y >> 1 }
      else { frac = frac * 2; m = y }
      j += 1
    }
    (e.toLong << FracBits) + frac
  }
}

/** `fixed_log2(x)` — codegen'd [[FixedLog2.log2q20]] over a bigint column. */
case class FixedPointLog2(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"fixed_log2 requires a bigint argument, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    FixedLog2.log2q20(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.FixedLog2.log2q20($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `fixed_log2_dec(x)` — codegen'd [[FixedLog2.log2q20Dec]] over a
  * `DECIMAL(38,0)` column: the 128-bit domain widening of
  * [[FixedPointLog2]] (identical results where the domains overlap —
  * LmSpec pins the agreement). Null-intolerant like its sibling; the
  * Kneser–Ney operator coalesces every joined count BEFORE the numerator
  * arithmetic, so a null reaching this expression can only mean a
  * decimal-38 overflow — the caller guards that loudly. */
case class FixedPointLog2Dec(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case d: DecimalType if d.scale == 0 => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"fixed_log2_dec requires a decimal(p,0) argument, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    FixedLog2.log2q20Dec(input.asInstanceOf[org.apache.spark.sql.types.Decimal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.FixedLog2.log2q20Dec($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LogFunctions {
  def fixedLog2(x: Column): Column =
    GraftBridge.column(FixedPointLog2(GraftBridge.expression(x)))

  def fixedLog2Dec(x: Column): Column =
    GraftBridge.column(FixedPointLog2Dec(GraftBridge.expression(x)))
}
