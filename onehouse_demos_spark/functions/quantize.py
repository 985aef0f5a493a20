"""Engine-proof numeric output contracts (VERDICT r11 #1/#2).

Any metric that faces a cross-engine value comparison (the driver's
correctness gate hashes Spark vs ITS OWN DuckDB build) must never pass
a double through an engine-specific conversion rule: ROUND half-tie
rules (Spark decimal-string HALF_UP vs binary rint), double->DECIMAL
cast rounding, interpolated quantiles, and order-dependent double
summation all forked r11 driver hashes.

The contract that cannot fork: per-row ``FLOOR(x * 10^n)`` (IEEE
multiply + floor — correctly-rounded, deterministic, bit-identical in
every binary64 engine), an exact BIGINT sum (order-free), and at most
ONE closing IEEE division by the power of ten. Property-tested against
DuckDB over adversarial inputs in tests/test_quantization_property.py.

``fsum`` / ``fsum_sql`` build the two sides of that contract with the
same shape and are the ONE SOURCE OF TRUTH (VERDICT r12 #4): the r13
refactor migrated the r12 conversions from inlined expression text to
these helpers, and tests/test_output_contract.py asserts every
quantized-sum occurrence in every registered oracle renders EXACTLY
the helper's canonical shape — a one-character divergence between a
builder and its oracle fails the meta-test, not the next driver round.

Overflow headroom (VERDICT r12 #6): a BIGINT accumulator holds
~9.2e18; a quantized e4 money sum at 100 TB (SF 1e5, ~6e11 lineitem
rows) exceeds it. ``fsum(..., wide=True)`` / ``fsum_sql(..., wide=True)``
switch the accumulator to DECIMAL(38,0) — sums of exact integers are
order-free in any width, so the contract is unchanged, at a measured
~1.6x aggregate-time cost (SCALING.md r13). The headroom meta-test in
tests/test_output_contract.py projects every windowed quantized sum to
SF 1e5 and requires thin metrics to ride the wide accumulator.

Residual, accepted exposure: operators in the LOG domain (DSIR
milli-nats, tf-idf, unigram surprisal) floor-quantize ln() outputs,
and ln is not a correctly-rounded IEEE op — two libms may differ by
1 ulp. A fork needs that ulp to straddle an integer boundary of the
quantization grid (~1e-9 measure per distinct input; the grid is per
VOCAB entry, not per row). Pinned against this box's DuckDB in
tests/test_quantization_property.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fquant(col: Column, n: int = 2) -> Column:
    """Per-row floor quantization to BIGINT 10^-n units."""
    return F.floor(col * (10 ** n)).cast("long")


def fsum(col: Column, n: int = 2, wide: bool = False) -> Column:
    """Order-free sum of floor-quantized values, closed by one IEEE
    division back to a double in original units. ``wide`` sums through
    a DECIMAL(38,0) accumulator for metrics whose BIGINT headroom is
    thin at the declared max scale; the DECIMAL->DOUBLE close is
    round-to-nearest in both engines, so the contract holds."""
    q = fquant(col, n)
    if wide:
        q = q.cast("decimal(38,0)")
    return F.sum(q).cast("double") / float(10 ** n)


def fsum_int(col: Column, n: int = 2, wide: bool = False) -> Column:
    """The raw integer-units sum (no closing division) — for metrics
    whose OUTPUT is the exact integer (BIGINT e-n units).

    The wide accumulator protects the INTERMEDIATE sum only; the
    output itself must still fit BIGINT (the cross-engine transport is
    int64). On a final-value overflow Spark's non-ANSI decimal->long
    cast silently yields NULL while DuckDB's CAST(... AS BIGINT)
    errors — an engine-divergence class this contract exists to kill —
    so the wide path guards the close with assert_true: both engines
    fail LOUDLY instead of diverging (r13 review)."""
    q = fquant(col, n)
    if wide:
        s = F.sum(q.cast("decimal(38,0)"))
        # NULL sum (empty/all-NULL input) is NOT an overflow: DuckDB's
        # CAST(NULL AS BIGINT) yields NULL, so the guard must pass it
        # through (assert_true(NULL) would raise — r14 review)
        ok = s.isNull() | (
            F.abs(s) <= F.lit(2 ** 63 - 1).cast("decimal(38,0)")
        )
        # when() WITHOUT otherwise: the two branches must differ or
        # Catalyst folds `CASE WHEN c THEN x ELSE x` to `x` and
        # optimizes the assertion away entirely
        return F.when(
            F.assert_true(
                ok, "fsum_int(wide): output exceeds BIGINT — the "
                "metric needs a different output contract, not a "
                "wider accumulator"
            ).isNull(),
            s.cast("long"),
        )
    return F.sum(q)


def fquant_sql(expr: str, n: int = 2) -> str:
    return f"CAST(FLOOR(({expr}) * {10 ** n}) AS BIGINT)"


def _acc_sql(expr: str, n: int, wide: bool) -> str:
    q = fquant_sql(expr, n)
    return f"SUM(CAST({q} AS DECIMAL(38,0)))" if wide else f"SUM({q})"


def fsum_sql(expr: str, n: int = 2, wide: bool = False) -> str:
    return (
        f"CAST({_acc_sql(expr, n, wide)} AS DOUBLE) / {float(10 ** n)!r}"
    )


def fsum_int_sql(expr: str, n: int = 2, wide: bool = False) -> str:
    """DuckDB side of ``fsum_int``. The BIGINT cast also matters for
    the narrow path: DuckDB's SUM(BIGINT) returns HUGEINT, which the
    gate's pandas transport turns into float64 — the explicit cast
    keeps the output an exact int64 in both engines."""
    return f"CAST({_acc_sql(expr, n, wide)} AS BIGINT)"
