"""Cross-engine-exact arithmetic idioms.

``round(CAST(sum AS DOUBLE) / count, d)`` is NOT a cross-engine-stable
way to state a rounded mean (docs/ROUND8.md §12): Spark rounds the
decimal rendering of the quotient double (java ``BigDecimal.valueOf``,
HALF_UP) while DuckDB multiplies the quotient by 10^d first and rounds
the inflated product double — whenever the exact rational sits within an
ulp of a half at the rounding digit the two engines split by 10^-d.
Found live by the round-8 chunk-profile fuzz on ``text_bigram_backoff_lm``
and fixed there (commit 883ca2b); this module is the shared form of that
fix, used by every ``mean rounded to d digits`` site in the catalog.

The stable restatement: compute the HALF_UP rounding of the EXACT
RATIONAL in integer arithmetic both engines perform identically. When
``sum`` carries exactly ``d`` decimals (a DECIMAL(p,d) fold) or is an
integer, ``u = sum * 10^d`` is an exact integer, and

    halfup(u / n) = sign(u) * ((2*|u| + n) div (2*n))

is the HALF_UP quotient (floor division on a non-negative numerator, so
floor == trunc and both engines agree). The final ``/ 10^d`` divides
identical exact integers and is correctly rounded on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _mul_pow10_spark(sum_sql: str, digits: int, integral_sum: bool) -> str:
    """``u = |sum| * 10^digits`` as an exact DECIMAL(38,0) in Spark SQL.

    Decimal sums multiply first (decimal arithmetic is exact; the
    precision reduction to scale 0 is loss-free because the product is
    integral). Integer sums cast FIRST — a LONG multiply by 10^9 would
    overflow for |sum| > ~9.2e9 at 100 TB group sizes.
    """
    if integral_sum:
        return f"CAST(abs({sum_sql}) AS DECIMAL(38,0)) * {10 ** digits}"
    return f"CAST(abs({sum_sql}) * {10 ** digits} AS DECIMAL(38,0))"


def halfup_mean(
    sum_sql: str, count_sql: str, digits: int, integral_sum: bool = False
) -> Column:
    """Spark Column: mean ``sum/count`` rounded HALF_UP at ``digits``,
    integer-exact (cross-engine stable at half boundaries).

    ``sum_sql`` must be an aggregate SQL expression whose value either is
    integral (``integral_sum=True``) or carries exactly ``digits``
    decimals (a DECIMAL(p, digits) fold). ``count_sql`` must be a
    positive integral aggregate.
    """
    u = _mul_pow10_spark(sum_sql, digits, integral_sum)
    return (
        F.expr(
            f"CAST(CASE WHEN {sum_sql} < 0 THEN -1 ELSE 1 END"
            f" * ((2 * {u} + {count_sql}) div (2 * {count_sql}))"
            " AS DOUBLE)"
        )
        / F.lit(float(10 ** digits))
    )


def halfup_mean_duck(
    sum_sql: str, count_sql: str, digits: int, integral_sum: bool = False
) -> str:
    """The DuckDB-side statement of :func:`halfup_mean` (same exact
    integers; HUGEINT carries the widened product, ``//`` floors the
    non-negative numerator).

    Domain (r10 audit of the ADVICE r9 wide-decimal concern): on the
    non-integral path DuckDB keeps ``DECIMAL(38,s) * 10^d`` as
    DECIMAL(38,s) internally (hugeint-backed — verified by typeof and
    a 4000-case sweep above 2^53 in tests/test_half_boundary.py, zero
    divergence), and OVERFLOWS LOUDLY (Out of Range, not a silent
    DOUBLE fallback) once the scaled integer exceeds 38 digits — i.e.
    |sum| >= ~10^(38-2d) (10^20 at d=9). The Spark side's DECIMAL(38,0)
    is exact to the same order. Both engines fail loud, never split.
    The HALF_UP quotient itself rides Spark's BIGINT ``div``: it
    overflows (NULL/ANSI error) once |2*u + n| exceeds ~9.2e18, i.e.
    |mean| >= ~9.2e(18-d) (ADVICE r9 #2) — DuckDB's HUGEINT ``//``
    keeps going, so a site whose MEANS can reach 9.2e9 at d=9 must
    lower d rather than trust the idiom."""
    if integral_sum:
        u = f"CAST(abs({sum_sql}) AS HUGEINT) * {10 ** digits}"
    else:
        u = f"CAST(abs({sum_sql}) * {10 ** digits} AS HUGEINT)"
    return (
        f"CAST(CASE WHEN {sum_sql} < 0 THEN -1 ELSE 1 END"
        f" * ((2 * {u} + {count_sql}) // (2 * {count_sql}))"
        f" AS DOUBLE) / 1e{digits}"
    )


def _ratio_exprs(
    num_sql: str,
    den_sql: str,
    digits: int,
    num_decimals: int,
    den_decimals: int,
    wide_int: str,
    intdiv: str,
) -> str:
    """Shared body of :func:`halfup_ratio` — the engine differences are
    only the wide integer type and the integer-division operator."""
    shift = digits - num_decimals + den_decimals
    if shift < 0:
        raise ValueError(
            "digits - num_decimals + den_decimals must be >= 0"
        )
    n_int = f"CAST(abs({num_sql}) * {10 ** num_decimals} AS {wide_int})"
    d_int = f"CAST(abs({den_sql}) * {10 ** den_decimals} AS {wide_int})"
    sign = (
        f"(CASE WHEN {num_sql} < 0 THEN -1 ELSE 1 END"
        f" * CASE WHEN {den_sql} < 0 THEN -1 ELSE 1 END)"
    )
    return (
        f"CASE WHEN {den_sql} IS NULL OR {num_sql} IS NULL"
        f" OR {den_sql} = 0 THEN NULL ELSE"
        f" CAST({sign} * ((2 * {n_int} * {10 ** shift} + {d_int})"
        f" {intdiv} (2 * {d_int})) AS DOUBLE) / 1e{digits} END"
    )


def halfup_ratio(
    num_sql: str,
    den_sql: str,
    digits: int,
    num_decimals: int = 0,
    den_decimals: int = 0,
) -> Column:
    """Spark Column: ``num/den`` rounded HALF_UP at ``digits``,
    integer-exact, NULL on a zero or NULL denominator (the
    ``try_divide`` contract). ``num``/``den`` must carry exactly
    ``num_decimals``/``den_decimals`` decimals (DECIMAL folds or
    integers); :func:`halfup_mean` is the ``den_decimals=0``,
    positive-count special case."""
    return F.expr(
        _ratio_exprs(
            num_sql, den_sql, digits, num_decimals, den_decimals,
            "DECIMAL(38,0)", "div",
        )
    )


def dblround(col: Column, digits: int) -> Column:
    """Cross-engine-stable quantization of a COMPOSITE DOUBLE at
    ``digits`` decimals — the r10 sibling of :func:`halfup_mean` for
    expressions with no statable exact rational (z-scores, kappa,
    variance/std, readability, log/sqrt outputs; docs/ROUND9.md §1's
    irreducible classes).

    ``round(x, d)`` is NOT cross-engine-stable on doubles: Spark rounds
    the SHORTEST DECIMAL RENDERING of x (java ``BigDecimal.valueOf``,
    HALF_UP) while DuckDB rounds the exact binary product ``x * 10^d``
    (``std::round``, half away from zero) — whenever x sits within an
    ulp of a half at the rounding digit the engines split by 10^-d
    (real-engine constructed divergences pinned in
    tests/test_double_boundary.py).

    The stable restatement rounds the SAME scaled double on both sides:
    ``round(x * 10^d, 0) / 10^d``. At scale 0 the two engines' rounding
    semantics coincide for every |y| < 2^51: y's shortest repr and its
    exact binary value can never straddle an integer-half boundary
    (k+0.5 is itself exactly representable, and a shortest repr D of y
    with a representable boundary between D and y would round-trip to
    the boundary instead of y), and ties round away from zero under
    both HALF_UP-on-decimal and std::round-on-binary. The multiply and
    final divide are single correctly-rounded IEEE ops on identical
    inputs. Domain: |x| < 2^51 / 10^digits (~4.5e6 at digits=9) —
    far above any z-score/kappa/ratio magnitude; NULL/NaN/Inf pass
    through identically on both engines.
    """
    return F.round(col * F.lit(float(10 ** digits)), 0) / F.lit(
        float(10 ** digits)
    )


def dblround_duck(expr: str, digits: int) -> str:
    """The DuckDB-side statement of :func:`dblround` (same scaled
    double, same integer-digit rounding)."""
    return f"round(({expr}) * 1e{digits}) / 1e{digits}"


def halfup_ratio_duck(
    num_sql: str,
    den_sql: str,
    digits: int,
    num_decimals: int = 0,
    den_decimals: int = 0,
) -> str:
    """The DuckDB-side statement of :func:`halfup_ratio`."""
    return _ratio_exprs(
        num_sql, den_sql, digits, num_decimals, den_decimals,
        "HUGEINT", "//",
    )
