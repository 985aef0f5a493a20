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
same shape. New queries should compose these; the r12 conversions
inlined the identical expression text per oracle (the sweep verifies
both sides value-exactly either way).

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


def fsum(col: Column, n: int = 2) -> Column:
    """Order-free sum of floor-quantized values, closed by one IEEE
    division back to a double in original units."""
    return F.sum(fquant(col, n)).cast("double") / float(10 ** n)


def fquant_sql(expr: str, n: int = 2) -> str:
    return f"CAST(FLOOR(({expr}) * {10 ** n}) AS BIGINT)"


def fsum_sql(expr: str, n: int = 2) -> str:
    return (
        f"CAST(SUM({fquant_sql(expr, n)}) AS DOUBLE) / {float(10 ** n)!r}"
    )
