"""Property tests for the floor-quantization output contract (r12).

Every driver-facing metric now rides `CAST(FLOOR(x * 10^n) AS BIGINT)`
(per row) + exact integer sums + at most one closing IEEE division.
The contract's soundness rests on three primitives being bit-identical
across engines:

1. IEEE-754 double multiplication by a constant,
2. floor of a double,
3. division of an exactly-representable integer by a power-of-ten
   double.

These are deterministic, correctly-rounded operations in every IEEE
implementation — unlike ROUND's half-tie rules (Spark decimal-string
HALF_UP vs binary rint), double->DECIMAL cast rounding, and
interpolated quantiles, each of which flipped an r11 driver hash.

Hypothesis drives adversarial doubles (decimal-boundary neighbors,
negatives, huge magnitudes, subnormals) through DuckDB and through
Python's float machinery (both strict IEEE-754 binary64) and asserts
bit-identical quantization. A Spark leg is pointless here — the JVM is
equally strict IEEE-754 — but the full-registry oracle sweep already
compares Spark vs DuckDB value-exactly on every query built from these
primitives.
"""

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st


def _duck_floor_e(x: float, scale: int) -> int | None:
    con = _CON
    r = con.execute(
        f"SELECT CAST(FLOOR(? * {scale}) AS BIGINT)", [x]
    ).fetchone()[0]
    return r


_CON = duckdb.connect()

# Adversarial doubles: exact decimal-boundary values (the ROUND
# half-tie class), their binary neighbors, and wide-range floats.
_boundaries = st.builds(
    lambda k, n: k / 10**n,
    st.integers(min_value=-(10**12), max_value=10**12),
    st.integers(min_value=0, max_value=6),
)
_floats = st.floats(
    allow_nan=False,
    allow_infinity=False,
    min_value=-1e12,
    max_value=1e12,
)
_values = st.one_of(_boundaries, _floats)


@settings(max_examples=300, deadline=None)
@given(x=_values, n=st.sampled_from([0, 2, 4, 6]))
def test_floor_quantization_is_engine_identical(x, n):
    scale = 10**n
    expect = math.floor(x * scale)  # Python: strict IEEE binary64
    if abs(expect) > 2**62:  # outside the contract's BIGINT envelope
        return
    got = _duck_floor_e(x, scale)
    assert got == expect, (x, n, got, expect)


@settings(max_examples=200, deadline=None)
@given(
    total=st.integers(min_value=-(10**15), max_value=10**15),
    n=st.sampled_from([2, 4, 6]),
)
def test_closing_division_is_engine_identical(total, n):
    """The one division at the output edge: exact BIGINT / 10^n as
    DOUBLE is a single correctly-rounded IEEE op everywhere."""
    scale = float(10**n)
    expect = total / scale
    got = _CON.execute(
        f"SELECT CAST(? AS DOUBLE) / {scale!r}", [total]
    ).fetchone()[0]
    assert got == expect and math.copysign(1, got) == math.copysign(
        1, expect
    ), (total, n, got, expect)


def test_round_half_tie_class_really_differs():
    """The failure class the contract retired, demonstrated live: an
    exactly-representable decimal tie (29/32 = 0.90625) rounds UP
    under decimal-string HALF_UP (what Spark's ROUND does) and DOWN
    under binary round-half-even (what rint-based engines do). Floor
    quantization of the same value is single-valued."""
    x = 29 / 32  # exactly representable: 0.90625
    duck_round = _CON.execute("SELECT ROUND(0.90625::DOUBLE, 4)").fetchone()[0]
    # whichever rule THIS DuckDB build uses, the point is the rule is
    # a choice — the two legitimate answers differ:
    assert duck_round in (0.9062, 0.9063)
    # ...while the floor contract admits exactly one answer everywhere:
    assert math.floor(x * 10000) == 9062
    assert _duck_floor_e(x, 10000) == 9062


@settings(max_examples=200, deadline=None)
@given(
    x=st.floats(min_value=1e-9, max_value=1e9),
    scale=st.sampled_from([1000, 10000, 1000000]),
)
def test_log_floor_quantization_matches_duckdb_here(x, scale):
    """The log-domain operators (dsir milli-nats, tfidf e4, unigram
    micro-nats) floor-quantize ln() outputs. Unlike multiply/floor,
    ln is NOT required to be correctly rounded by IEEE-754 — two
    libms may differ by 1 ulp, and a 1-ulp difference exactly at an
    integer boundary would fork the floor. This test pins that THIS
    box's DuckDB ln and Python's (both libm-backed, like the JVM's
    StrictMath-adjacent Math.log) floor-quantize identically over
    adversarial inputs; the residual cross-engine exposure is a
    <~1e-9-measure coincidence per distinct input, accepted and
    documented in the operators' docstrings (the alternative —
    rational-arithmetic logs — changes the operators' semantics)."""
    expect = math.floor(math.log(x) * scale)
    got = _CON.execute(
        f"SELECT CAST(FLOOR(ln(?) * {scale}) AS BIGINT)", [x]
    ).fetchone()[0]
    assert got == expect, (x, scale, got, expect)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1,
        max_size=50,
    )
)
def test_integer_sums_are_order_free(xs):
    """Unlike double sums (the pricing_summary latent risk), integer
    sums cannot depend on partitioning/visit order."""
    assert sum(xs) == sum(reversed(xs)) == sum(sorted(xs))
    got = _CON.execute(
        "SELECT CAST(SUM(x) AS BIGINT) FROM (SELECT UNNEST(?) AS x)",
        [xs],
    ).fetchone()[0]
    assert got == sum(xs)
