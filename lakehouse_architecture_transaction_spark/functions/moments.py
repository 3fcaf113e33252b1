"""Exact decimal moment helpers — the Σx² overflow discipline.

The r12 skew probe crashed ``customer_order_value_cv`` on a 30%-hot
customer: int64 square-sums of cent values pass 2^63 (x ≤ ~5.5e7
cents → x² ≈ 3e15; 45k hot orders ≈ 1.4e20 > 9.2e18), and a hand
sweep found the same latent class in two more registered queries.
Every power-sum aggregate in the engine therefore accumulates in
DECIMAL (exact in both engines; DuckDB oracles mirror with HUGEINT),
and this module is the ONE place that builds those expressions — a
new square-sum written against raw int64 fails CI via
tests/test_moment_discipline.py, which AST-scans the package for
sum-of-product aggregates that bypass these helpers.

ANSI/overflow semantics (ADVICE r12): Spark caps decimal multiply
precision at 38 digits, so ``n·Σx² − (Σx)²`` CAN still overflow for
astronomically wide groups (n·Σx² ≳ 1e38 — roughly 1e7 orders per
customer at full corpus price ranges, ~1e19 events per cell). Under
ANSI (the tuned session AND the external driver's plain session —
Spark 4 defaults ANSI on) overflow RAISES. In a non-ANSI deployment
decimal overflow yields NULL, which would silently drop rows from
downstream predicates — ``m2_numerator`` therefore wraps the product
in an explicit guard that converts that NULL into a raised error, so
no deployment mode can silently lose data.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: cast for the VALUES being squared: (19,0) × (19,0) multiplies into
#: Spark's 38-digit cap with no precision loss for int64-ranged inputs
DEC19 = "decimal(19,0)"
#: cast for accumulated sums entering second-moment arithmetic
DEC38 = "decimal(38,0)"


def sum_sq_dec(x: Column) -> Column:
    """Exact Σx² aggregate: square in DECIMAL, never int64.

    ``x`` must be integer-valued (counts, cent units, day indexes).
    The (19,0) cast keeps the square exact for any int64 input; the
    decimal sum is exact to 38 digits and raises (ANSI) rather than
    wrapping when a group genuinely exceeds that.
    """
    xd = x.cast(DEC19)
    return F.sum(xd * xd)


def m2_numerator(n: Column, sx: Column, sxx: Column) -> Column:
    """Exact ``n·Σx² − (Σx)²`` (the sample-variance numerator) in
    DECIMAL(38,0), with the non-ANSI silent-overflow guard.

    CONTRACT (ADVICE r14): ``n`` must be the NON-NULL observation
    count of x — ``COUNT(x)``, or ``COUNT(*)`` over a column that is
    provably non-nullable. The input-sum guard reads "n > 0 while
    Σx/Σx² is NULL" as decimal-SUM overflow; a ``COUNT(*)`` over a
    nullable x makes an all-NULL group hit exactly that shape (SUM
    over no non-null values is NULL) and raise spuriously. Pinned by
    tests/test_moment_discipline.py::test_m2_numerator_n_contract.

    Inputs are the group's count, Σx, and Σx² (from
    :func:`sum_sq_dec`). The two products are (38,0)×(38,0) and cap
    at 38 digits: under ANSI an overflow raises; in a non-ANSI
    session it yields NULL, which downstream predicates would read as
    "drop this row" — the assert_true guard converts exactly that
    case (NULL result from non-NULL inputs) into a raised error
    instead (ADVICE r12). The guard also covers the INPUT sums
    (ADVICE r13): if Σx or Σx² themselves overflowed their decimal
    SUM in a non-ANSI session they arrive NULL while n > 0, and the
    original non-NULL-inputs predicate would have waved that through
    as a silent NULL — a non-empty group with a NULL input sum now
    raises too. Only the genuinely-empty case (n NULL or 0, as outer
    joins and empty groups produce) passes NULL through: zero
    observations is no evidence, not an overflow.
    """
    nd = n.cast(DEC38)
    sx38 = sx.cast(DEC38)
    prod = nd * sxx.cast(DEC38) - sx38 * sx38
    overflowed = (
        prod.isNull() & n.isNotNull() & sx.isNotNull() & sxx.isNotNull()
    ) | (n.isNotNull() & (n > 0) & (sx.isNull() | sxx.isNull()))
    # assert_true yields NULL when the predicate holds and raises
    # otherwise; the when() wrapper threads that NULL away so the
    # guarded expression keeps the product's type and value
    guard = F.assert_true(
        ~overflowed,
        F.lit(
            "decimal(38,0) moment overflow: n*sum(x^2) - sum(x)^2 "
            "exceeded 38 digits (non-ANSI session would silently NULL this)"
        ),
    )
    return F.when(guard.isNull(), prod)
