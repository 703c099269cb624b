package graft.core

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions.pmod

/** Shared integer-column arithmetic for the fixed-point ppm family. */
object IntCols {

  /** Exact FLOOR division of long columns, DuckDB `//` parity on ANY
    * sign: `a - pmod(a, b)` is an exact multiple of `b`, so integral
    * (truncating) division of it equals floor division of `a` — and the
    * whole computation stays in LONG arithmetic via Catalyst's
    * `IntegralDivide` (SQL `div`), never routing through a double.
    *
    * The double form `((a - pmod(a, b)) / b).cast("long")` this replaces
    * is exact only while the numerator stays under 2^53: at corpus scale
    * a ppm-scaled count can cross that silently (n ≈ 1e9 docs × m² × 1e6
    * in the kappa family sits right at the edge — the kendallTau ADVICE
    * finding, fixed engine-wide here). Division by zero follows `div`'s
    * ANSI contract: callers guard with `when(b > 0, ...)` exactly as
    * they guarded the double form.
    *
    * The divisor must be POSITIVE: Spark's `pmod` is the positive
    * remainder only for b > 0 (pmod(7, −2) = 1, so the form would ceil,
    * not floor, on a negative divisor). Every fixed-point site divides
    * by a count, a bin width, or a ppm scale — positive by construction;
    * a negative divisor is a caller bug, same as zero.
    *
    * Domain edge: `a - pmod(a, b)` overflows (ANSI arithmetic exception)
    * when `a` lies within `b − 1` of `Long.MinValue` — "exact for any
    * long" holds everywhere except that bottom sliver. No ppm-scale call
    * site can reach it (counts and scaled differences sit many orders of
    * magnitude above −2^63), but a new full-domain caller must clamp or
    * pre-shift first. */
  def floorDiv(a: Column, b: Column): Column =
    GraftColumnBridge.column(new IntegralDivide(
      GraftColumnBridge.expression(a - pmod(a, b)),
      GraftColumnBridge.expression(b)))
}
