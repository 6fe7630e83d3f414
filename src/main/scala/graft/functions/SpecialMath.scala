package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Special-function kernels for the ADX statistical tier (`beta_cdf`,
  * `beta_inv`, `erf`/`erfc`, `welch_test`'s t-CDF) — straight-line
  * ports of the engine's former SQL higher-order-fold formulations,
  * preserving the EXACT IEEE operation order so results are
  * bit-identical to both the old lambdas and the DuckDB oracle's
  * recursive-CTE replay (built from the same published recurrences:
  * `KqlParser.loggammaCore` / `betacfFold` / `betacfInitD` /
  * `erfFoldStep` still generate the oracle arithmetic).
  *
  * Why native: Spark's higher-order `aggregate` lambdas evaluate
  * INTERPRETED, outside whole-stage codegen — a 24-step Newton
  * iteration wrapping a 200-step Lentz fraction cost ~2 s of driver
  * analysis + interpreted evaluation per query on 30 rows (r15
  * verdict #3), and the struct-fold expression re-evaluated shared
  * subterms up to 10× per step. A JIT'd loop runs the identical
  * arithmetic in microseconds and keeps the surrounding projection in
  * whole-stage codegen — the custom-Expression tier of the extension
  * ladder, same as [[DotProduct]].
  *
  * All iteration counts are FIXED (200 / 160 / 24, no data-dependent
  * early exit) — unchanged from the SQL forms, so the oracle's
  * fixed-depth recursions mirror them exactly.
  */
object SpecialMath {

  /** Lanczos ln Γ(x) (g = 7, n = 9 — the published coefficients used
    * by `KqlParser.loggammaCore`), x > 0. Op order matches the SQL
    * chain: left-folded partial-fraction sum, then
    * (0.5·ln 2π + (z+0.5)·ln(z+7.5) − (z+7.5) + ln sum) − shift. */
  def loggamma(x: Double): Double = {
    val z = if (x < 0.5) x else x - 1.0
    var sum = 0.99999999999980993
    sum = sum + 676.5203681218851 / (z + 1.0)
    sum = sum + -1259.1392167224028 / (z + 2.0)
    sum = sum + 771.32342877765313 / (z + 3.0)
    sum = sum + -176.61502916214059 / (z + 4.0)
    sum = sum + 12.507343278686905 / (z + 5.0)
    sum = sum + -0.13857109526572012 / (z + 6.0)
    sum = sum + 0.0000099843695780195716 / (z + 7.0)
    sum = sum + 0.00000015056327351493116 / (z + 8.0)
    (0.5 * Math.log(2.0 * Math.PI) + (z + 0.5) * Math.log(z + 7.5) -
      (z + 7.5) + Math.log(sum)) -
      (if (x < 0.5) Math.log(x) else 0.0)
  }

  private def guard(v: Double): Double =
    if (Math.abs(v) < 1.0e-30) 1.0e-30 else v

  /** Lentz/NR continued fraction of I_x(a,b): 200 fixed double-steps
    * of `KqlParser.betacfFold` over the `betacfInitD` start. */
  private def betacf(a: Double, b: Double, x: Double): Double = {
    var c = 1.0
    var d = 1.0 / guard(1.0 - (a + b) * x / (a + 1.0))
    var h = d
    var m = 1
    while (m <= 200) {
      val mD = m.toDouble
      val aa1 = mD * (b - mD) * x / ((a - 1.0 + 2.0 * mD) * (a + 2.0 * mD))
      val d1i = 1.0 / guard(1.0 + aa1 * d)
      val c1 = guard(1.0 + aa1 / c)
      val h1 = h * d1i * c1
      val aa2 = -((a + mD) * (a + b + mD) * x) /
        ((a + 2.0 * mD) * (a + 1.0 + 2.0 * mD))
      val d2i = 1.0 / guard(1.0 + aa2 * d1i)
      val c2 = guard(1.0 + aa2 / c1)
      h = h1 * d2i * c2
      d = d2i
      c = c2
      m += 1
    }
    h
  }

  /** Regularized incomplete beta I_x(a,b), a,b > 0 (the caller nulls
    * non-positive shapes). x ≤ 0 → 0, x ≥ 1 → 1; NR symmetry split at
    * x < (a+1)/(a+b+2). Branch 2 keeps the SQL form's literal
    * `1 − (1 − x)` re-complement (NOT algebraically simplified to x —
    * it differs in IEEE) so both the old lambda and the oracle mirror
    * bit-for-bit. */
  def ibeta(a: Double, b: Double, x: Double): Double = {
    if (x <= 0.0) 0.0
    else if (x >= 1.0) 1.0
    else if (x < (a + 1.0) / (a + b + 2.0)) {
      val lab = loggamma(a + b); val la = loggamma(a); val lb = loggamma(b)
      Math.exp(lab - la - lb + a * Math.log(x) + b * Math.log(1.0 - x)) *
        betacf(a, b, x) / a
    } else {
      val x1 = 1.0 - x
      val lab = loggamma(b + a); val lb = loggamma(b); val la = loggamma(a)
      1.0 - Math.exp(lab - lb - la + b * Math.log(x1) +
        a * Math.log(1.0 - x1)) * betacf(b, a, x1) / b
    }
  }

  /** erf(x): 160 fixed terms of the all-positive confluent series
    * (`KqlParser.erfFoldStep`), ±1 saturation past |x| = 6 (documented
    * deviation, true |erfc| < 3e-17 there). */
  def erf(x: Double): Double = {
    if (Math.abs(x) >= 6.0) Math.signum(x)
    else {
      val q = 2.0 * x * x
      var t = 1.0
      var s = 1.0
      var m = 1
      while (m <= 160) {
        t = t * q / (2.0 * m.toDouble + 1.0)
        s = s + t
        m += 1
      }
      2.0 * x / Math.sqrt(Math.PI) * Math.exp(-(x * x)) * s
    }
  }

  /** Inverse regularized incomplete beta: 24 fixed
    * bisection-safeguarded Newton steps (the NR invbetai shape) from
    * the mean a/(a+b) over bracket (1e-12, 1−1e-12); candidate
    * accepted on an INCLUSIVE bracket test (at exact convergence
    * f = 0 parks the iteration on the root), midpoint otherwise (pdf
    * underflow → ±Inf/NaN candidate → midpoint, no NaN escape).
    * Domain guards (p∉[0,1], shapes ≤ 0 → null; p=0→0, p=1→1) live in
    * the caller. */
  def betaInv(p: Double, a: Double, b: Double): Double = {
    val lab = loggamma(a + b); val la = loggamma(a); val lb = loggamma(b)
    var lo = 1.0e-12
    var hi = 1.0 - 1.0e-12
    var x = a / (a + b)
    var m = 1
    while (m <= 24) {
      val f = ibeta(a, b, x) - p
      val pd = Math.exp((a - 1.0) * Math.log(x) + (b - 1.0) * Math.log(1.0 - x) +
        lab - la - lb)
      val lo2 = if (f > 0.0) lo else x
      val hi2 = if (f > 0.0) x else hi
      val xn = x - f / pd
      x = if (xn >= lo2 && xn <= hi2) xn else (lo2 + hi2) / 2.0
      lo = lo2
      hi = hi2
      m += 1
    }
    x
  }
}

/** `graft_ibeta(a, b, x)` → I_x(a,b); null for a ≤ 0 or b ≤ 0. */
case class GraftIbeta(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ibeta"
  override def checkInputDataTypes(): TypeCheckResult =
    SpecialMathExpr.requireDoubles(prettyName, first, second, third)

  override def nullSafeEval(a: Any, b: Any, x: Any): Any = {
    val av = a.asInstanceOf[Double]; val bv = b.asInstanceOf[Double]
    if (av <= 0.0 || bv <= 0.0) null
    else SpecialMath.ibeta(av, bv, x.asInstanceOf[Double])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, x) => s"""
       |if ($a <= 0.0 || $b <= 0.0) {
       |  ${ev.isNull} = true;
       |} else {
       |  ${ev.value} = graft.functions.SpecialMath.ibeta($a, $b, $x);
       |}
     """.stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** `graft_erf(x)` → erf(x). */
case class GraftErf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_erf"
  override def checkInputDataTypes(): TypeCheckResult =
    SpecialMathExpr.requireDoubles(prettyName, child)

  override def nullSafeEval(x: Any): Any =
    SpecialMath.erf(x.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.SpecialMath.erf($x)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}

/** `graft_beta_inv(p, a, b)`; null for p ∉ [0,1] or shapes ≤ 0;
  * p = 0 → 0, p = 1 → 1. */
case class GraftBetaInv(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_beta_inv"
  override def checkInputDataTypes(): TypeCheckResult =
    SpecialMathExpr.requireDoubles(prettyName, first, second, third)

  override def nullSafeEval(p: Any, a: Any, b: Any): Any = {
    val pv = p.asInstanceOf[Double]
    val av = a.asInstanceOf[Double]; val bv = b.asInstanceOf[Double]
    if (av <= 0.0 || bv <= 0.0 || pv < 0.0 || pv > 1.0) null
    else if (pv == 0.0) 0.0
    else if (pv == 1.0) 1.0
    else SpecialMath.betaInv(pv, av, bv)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, a, b) => s"""
       |if ($a <= 0.0 || $b <= 0.0 || $p < 0.0 || $p > 1.0) {
       |  ${ev.isNull} = true;
       |} else if ($p == 0.0) {
       |  ${ev.value} = 0.0;
       |} else if ($p == 1.0) {
       |  ${ev.value} = 1.0;
       |} else {
       |  ${ev.value} = graft.functions.SpecialMath.betaInv($p, $a, $b);
       |}
     """.stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

private[functions] object SpecialMathExpr {
  def requireDoubles(name: String, es: Expression*): TypeCheckResult =
    if (es.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects DOUBLE arguments, got " +
        es.map(_.dataType.simpleString).mkString("(", ", ", ")"))
}
