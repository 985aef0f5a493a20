"""Registry-wide output-contract audit (VERDICT r11 #2).

The driver's correctness gate hashes each windowed query's values from
BOTH engines (Spark and ITS OWN DuckDB build, which may not match the
local one). Three r11 rows failed on exactly this: outputs that pass a
double through an engine-specific conversion rule at the boundary —
interpolated quantiles, per-row double->DECIMAL casts (tie rules),
ROUND-half rules, and DuckDB's SUM(BIGINT)->HUGEINT widening (which
pandas converts to float64 while Spark's stays int64).

This test asserts the contract on the FULL registry (r12 widened it
from the 50-query driver window: any registered query can rotate into
the gate in a later round, so the whole registry must be
contract-clean or carry a written justification):

1. Type level (DESCRIBE, no execution): no HUGEINT/INT128 output
   column, no DECIMAL output column unless whitelisted.
2. Text level: no ROUND(SUM(...)) / ROUND(AVG(...)) over doubles and
   no per-row double->DECIMAL CAST in the oracle unless whitelisted.

Whitelisted entries carry a written justification — each is a
construct whose residual cross-engine risk is measure-zero-class
(single-expression arithmetic over identical arrays, IEEE-exact sqrt,
ROUND applied to a value whose distance from the half boundary is
bounded below) rather than the deterministic failure classes above.
The fix for an offender is the floor-quantized contract:
CAST(FLOOR(x * 10^n) AS BIGINT) per row, exact integer sums, one
closing IEEE division — bit-identical in every engine.
"""

import re

import duckdb
import pytest

from onehouse_demos_spark.operators import all_oracles, extra_oracles

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# DECIMAL output columns tolerated in the driver window. Keyed by
# (query, column); value = why the residual risk is not the r11 class.
DECIMAL_WHITELIST = {
    ("bm25_topk", "bm25_score"):
        "DECIMAL(18,6) cast of an ALREADY-6dp-ROUNDed double: the "
        "double sits within 1 ulp of k*1e-6, so the decimal cast "
        "recovers k in every engine — no per-row tie exposure. Green "
        "in the r11 driver run.",
}

# Oracles allowed to keep ROUND-over-aggregate / double->DECIMAL text.
ROUND_WHITELIST = {
    "knn_ivf_trained":
        "ROUND(AVG(component),6) is the k-means REPLAY contract: both "
        "engines quantize the trained centroids identically so the "
        "oracle replays the exact same quantizer; assignment ties "
        "break on cid. Non-windowed since r12; driver-green r6+r11.",
    "cluster_balanced_sample":
        "same k-means replay contract as knn_ivf_trained; the cap "
        "CEIL(0.5*n/8.0) is powers-of-two exact in both decimal and "
        "double arithmetic. Driver-green r11, non-windowed since r12.",
    "ann_index_search":
        "ROUND(SUM(lut.d),6) ranks a 16-term per-vector ADC sum (ulp "
        "~1e-15 vs 5e-7 half-boundary) and the final cos_sim is one "
        "arithmetic expression over identical arrays (sequential dot "
        "product, IEEE-exact sqrt). Green in the r11 driver run.",
    "ann_index_incremental": "same construction as ann_index_search.",
    "pq_adc_topk": "same ADC construction as ann_index_search.",
    "bm25_topk":
        "ROUND(SUM(c),6): per-doc sums of O(1..10) term contributions, "
        "ulp ~1e-15 against a 5e-7 half boundary; ordering tie-broken "
        "by doc_id. Green in the r11 driver run.",
    "semantic_dedup_keep":
        "ROUND(cos,4) feeds only the tau rank selection; the output "
        "columns are ids + booleans. Green r10/r11 driver runs.",
    "near_dup_canonical":
        "rounding appears only inside similarity pair generation; "
        "output columns are ids. Green in the r11 driver run.",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _windowed_oracles():
    oracles = all_oracles()
    return {k: oracles[k] for k in list(oracles)[:50]}


def _registry():
    oracles = dict(all_oracles())
    oracles.update(extra_oracles())
    return oracles


def test_no_hugeint_or_unlisted_decimal_outputs(con):
    """DuckDB SUM(BIGINT) widens to HUGEINT (=> float64 in pandas while
    Spark stays int64 — the dsir r11 hash-flip class); DECIMAL outputs
    ride engine-specific tie rules on the way in. Neither may face the
    driver unlisted."""
    bad = []
    for name, sql in _registry().items():
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as exc:  # pragma: no cover - schema drift
            bad.append((name, f"DESCRIBE failed: {exc}"))
            continue
        for cname, ctype, *_ in cols:
            up = str(ctype).upper()
            if "HUGEINT" in up or "INT128" in up:
                bad.append((name, f"{cname}: {ctype}"))
            if "DECIMAL" in up and (name, cname) not in DECIMAL_WHITELIST:
                bad.append((name, f"{cname}: {ctype} (unlisted DECIMAL)"))
    assert not bad, f"driver-facing output-type hazards: {bad}"


# the CAST branch tolerates three levels of nested parens in the
# operand (CAST(SUM(x) AS DECIMAL), CAST(SUM(FLOOR(x*10^n)) AS DECIMAL)
# and CAST(CAST(FLOOR((x)*10^n) AS BIGINT) AS DECIMAL) must not escape
# the audit — r12 review twice, deepened in r13 for the wide shape)
_PAREN1 = r"\((?:[^()])*\)"
_PAREN2 = rf"\((?:[^()]|{_PAREN1})*\)"
_PAREN3 = rf"\((?:[^()]|{_PAREN2})*\)"
_RISKY_TEXT = re.compile(
    r"ROUND\(\s*(?:SUM|AVG)\("
    rf"|CAST\((?:[^()]|{_PAREN3})*\bAS\s+DECIMAL"
    r"|::DECIMAL",
    re.IGNORECASE,
)

# The ONE legal DECIMAL cast: the wide-accumulator leg of the
# floor-quantized sum contract (functions/quantize.py::_acc_sql,
# VERDICT r12 #6). Casting an EXACT BIGINT to DECIMAL(38,0) has no tie
# exposure (integers convert exactly); it exists so e4 money sums
# survive 100 TB row counts. Strip exactly that canonical rendering
# before the risky-text scan so anything else still fails the audit.
_WIDE_ACC = re.compile(
    r"CAST\(CAST\(FLOOR\({_P3} \* 10+\) AS BIGINT\)\s+"
    r"AS DECIMAL\(38,\s*0\)\)".replace("{_P3}", _PAREN3),
    re.IGNORECASE,
)
# CASE-wrapped wide accumulator (conditional sums, e.g. the Q8-shaped
# market-share numerator): CAST(CASE WHEN ... THEN <fquant> END AS
# DECIMAL(38,0)).
_WIDE_ACC_CASE = re.compile(
    r"CAST\(CASE WHEN (?:[^()]|{_P3})*"
    r"THEN\s+CAST\(FLOOR\({_P3} \* 10+\) AS BIGINT\)\s+"
    r"END AS DECIMAL\(38,\s*0\)\)".replace("{_P3}", _PAREN3),
    re.IGNORECASE,
)


def _strip_wide_acc(sql: str) -> str:
    s = re.sub(r"\s+", " ", sql)
    s = _WIDE_ACC.sub("WIDE_ACC", s)
    return _WIDE_ACC_CASE.sub("WIDE_ACC", s)


def test_no_unlisted_round_over_aggregate(con):
    bad = []
    for name, sql in _registry().items():
        if name in ROUND_WHITELIST:
            continue
        m = _RISKY_TEXT.search(_strip_wide_acc(sql))
        if m:
            bad.append((name, m.group(0)))
    assert not bad, (
        "order-dependent rounding / double->DECIMAL in driver-facing "
        f"oracles (floor-quantize them or whitelist with cause): {bad}"
    )


def test_whitelists_reference_registered_queries_only():
    reg = set(_registry())
    win = set(_windowed_oracles())
    stale = {n for n in ROUND_WHITELIST if n not in reg}
    stale |= {q for q, _ in DECIMAL_WHITELIST if q not in reg}
    stale |= {n for n in NONVACUOUS_WHITELIST if n not in reg}
    # the heavy-replay vacuity skips are WINDOW exemptions: an entry
    # that left the window is stale (its replacement would go unprobed)
    stale |= {n for n in NONVACUOUS_SKIP_HEAVY if n not in win}
    assert not stale, f"stale whitelist entries: {stale}"


# Intentionally-empty results: the EMPTY SET is the assertion.
NONVACUOUS_WHITELIST = {
    "tbl_dup_key_invariant":
        "Q7's dup-key invariant: 0 rows IS the correct answer (no "
        "duplicate keys survive an upsert chain); the upsert-chain "
        "oracles assert the same content positively.",
}


# Heavy replay oracles (k-means / PQ training re-run in SQL): their
# DuckDB evaluation is minutes-scale, and their non-vacuity is already
# pinned elsewhere — CORRECTNESS_r11 recorded spark_rows = 64/64/10/20
# for the ANN family and the sweep checks them value-exactly at every
# SF. Exempting them keeps this probe seconds-scale.
NONVACUOUS_SKIP_HEAVY = {
    # ann_index_search / semantic_dedup_keep / near_dup_canonical
    # rotated out of the window in r13; their replacements are
    # cheap-oracle queries probed normally.
    "ann_index_incremental", "pq_adc_topk",
}


# ---------------------------------------------------------------------------
# Quantization contract composition (VERDICT r12 #4): the helpers in
# functions/quantize.py are the ONE source of truth. Every power-of-ten
# FLOOR quantization in every registered oracle must render EXACTLY the
# helper's canonical shape — a one-character divergence between a
# builder and its oracle becomes a red test here instead of a driver
# hash-fail three rounds later.
# ---------------------------------------------------------------------------


def _quant_sites(sql: str):
    """Yield (inner_expr, n, canonical) for every FLOOR(X * 10^n) in a
    whitespace-normalized oracle text. `canonical` is True when the
    site renders exactly fquant_sql(inner_expr, n)."""
    s = re.sub(r"\s+", " ", sql)
    for m in re.finditer(r"FLOOR\(", s):
        i = m.end() - 1
        depth, j = 0, i
        while j < len(s):
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        inner = s[i + 1:j]
        # integer multiplier is canonical; the float spelling
        # (`* 1000.0`) is the same quantization and must not escape
        # the audit by its literal form (found hiding twice in r13)
        mm = re.search(r"\*\s*(10+)(?:\.0)?\s*$", inner)
        if not mm:
            continue  # bucket geometry etc. — not a quantization
        n = len(mm.group(1)) - 1
        if inner[mm.start():].rstrip().endswith(".0"):
            yield inner[: mm.start()].strip(), n, False
            continue
        expr = inner[: mm.start()].strip()
        wrapped = (
            s[max(0, m.start() - 5):m.start()].endswith("CAST(")
            and s[j + 1:j + 12].strip().startswith("AS BIGINT")
        )
        canonical = (
            wrapped and expr.startswith("(") and expr.endswith(")")
        )
        yield expr, n, canonical


def test_quantization_sites_render_the_helper_shape():
    from onehouse_demos_spark.functions.quantize import fquant_sql

    bad = []
    for name, sql in _registry().items():
        for expr, n, canonical in _quant_sites(sql):
            if not canonical:
                bad.append((name, expr[:60], n))
                continue
            # the canonical site must literally equal the helper's
            # rendering of its inner expression
            rendered = fquant_sql(expr[1:-1], n)
            assert f"CAST(FLOOR({expr} * {10 ** n}) AS BIGINT)" == rendered
    assert not bad, (
        "quantization sites diverging from fquant_sql's canonical "
        f"shape (compose the helper): {bad}"
    )


# ---------------------------------------------------------------------------
# Integer-accumulator overflow headroom (VERDICT r12 #6). The declared
# contract scale is 100 TB = SF 1e5; the gate runs sf0.001 here, so a
# quantized BIGINT sum observed at magnitude M must satisfy
# M * (1e5/0.001) * SAFETY < 2^63, else the metric must ride the
# DECIMAL(38,0) wide accumulator (functions/quantize.py). The linear
# row-scale model is conservative for per-key groups (their size does
# not grow with SF) and exact for fixed-cardinality groups — the ones
# that actually overflow.
# ---------------------------------------------------------------------------

CONTRACT_MAX_SF = 1e5  # ~100 TB of TPC-H-shaped data
_GATE_SF = 0.001       # SF_DIR above
_SAFETY = 8.0


def _sum_sites(sql: str):
    """(start, inner, wide) for every SUM whose operand contains a
    power-of-ten FLOOR quantization — narrow BIGINT or wide
    DECIMAL(38,0) accumulator."""
    s = re.sub(r"\s+", " ", sql)
    for m in re.finditer(r"SUM\(", s):
        i = m.end() - 1
        depth, j = 0, i
        while j < len(s):
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        inner = s[i + 1:j]
        if not re.search(r"FLOOR\((?:[^()]|\(.*\))*\*\s*10+\s*\)", inner):
            continue
        yield inner, "DECIMAL(38" in inner.upper()


# Every NARROW quantized sum in a REGISTERED oracle (r14: the full
# registry, not just the driver window — rotation can never surface an
# unledgered narrow sum again) must appear here with how to bound it:
# ("col", output_column, n) measures MAX(ABS(output_column)) * 10^n
# from the oracle's own result and scales it linearly to the contract
# SF; ("avg", output_column, count_column, n) multiplies by the group
# count (the accumulator holds the SUM, not the mean); ("probe", sql,
# n) evaluates a standalone upper-bound probe for sums not visible in
# the final output; ("keybound", output_column, n) measures the same
# magnitude but does NOT scale it with SF — for sums grouped by a
# row-identity key (orderkey / custkey / suppkey), TPC-H growth adds
# KEYS, not rows per key, so per-group magnitude is SF-invariant (×8
# safety still applies). The scanner below forces this ledger
# complete.
WINDOWED_SUM_LEDGER = {
    "pricing_summary": [
        # sum_qty's accumulator is its output x 10^2; avg_qty shares
        # the same aggregate expression. avg_disc's accumulator is
        # avg x count x 10^4 (the sum the mean folds away).
        ("col", "sum_qty", 2),
        ("avg", "avg_disc", "count_order", 4),
    ],
    "join_dim_rollup": [("col", "total_acctbal", 2)],
    "idle_customer_balance": [
        ("col", "totacctbal", 2),
        # the exact integer-cents threshold subquery: global positive
        # acctbal sum in cents
        ("probe",
         "SELECT SUM(ABS(CAST(ROUND(c_acctbal * 100) AS BIGINT))) "
         "FROM customer WHERE c_acctbal > 0", 0),
    ],
    "large_volume_customers": [("col", "total_qty", 2)],
    "events_gapfill": [("col", "sum_value_locf_e4", 0)],
    "streaming_dedup_counts": [("col", "sum_value_r", 2)],
    # ---- r14 (VERDICT r13 "What's wrong" #2): the ledger now covers
    # the FULL registry, so rotation can never surface an unledgered
    # narrow sum. Global/fixed-group sums scale linearly ("col");
    # sums grouped by a row-identity key are SF-invariant per group
    # ("keybound": orderkey groups hold ~1-7 lineitems, custkey
    # groups ~10 orders, suppkey groups ~600 lineitems at EVERY SF —
    # growth adds keys, not rows per key).
    # (bracketed_revenue, local_supplier_volume,
    # rollup_status_priority, promo_revenue_by_type measured THIN in
    # the r14 extension and were moved to wide accumulators —
    # structurally safe, no entry needed.)
    "tbl_matview_rollup": [("col", "rev_r", 2)],
    "top_revenue_orders": [("keybound", "revenue", 4)],
    "label_centroid_distance": [("col", "sum_all_e6", 0)],
    "cube_returnflag_linestatus": [("col", "qty", 2)],
    "window_rank_orders": [("keybound", "run_total", 2)],
    "revenue_moving_avg": [("col", "sum7_r", 2)],
    "range_join_bands": [("col", "sum_value_r", 2)],
    "skew_safe_agg": [("col", "sum_value_r", 2)],
    # avg_yearly = e2 sum / 700: bound the accumulator by x * 10^3
    "small_quantity_revenue": [("col", "avg_yearly", 3)],
    "top_supplier_revenue": [("keybound", "total_revenue", 4)],
    "returned_item_report": [("keybound", "revenue", 4)],
    "forecast_revenue_change": [("col", "revenue", 4)],
    "monthly_revenue_trend": [("col", "revenue", 2)],
    "shipping_priority": [("keybound", "revenue", 4)],
}


def test_windowed_integer_sums_have_100tb_headroom(con):
    """VERDICT r12 #6 / r13 #4: e4 sums of price-scale doubles exceed
    BIGINT at 100 TB. Every quantized sum in the FULL registry (r14 —
    not just the driver window, so rotation can never surface an
    unledgered narrow sum) is either WIDE (DECIMAL(38,0) — 1e38
    headroom, structurally safe) or measured here: observed magnitude
    at the gate SF, scaled to the declared CONTRACT_MAX_SF (linearly,
    or held SF-invariant for per-row-identity-key groups) with an 8x
    safety factor, must fit int64."""
    limit = 2.0 ** 63
    scale = CONTRACT_MAX_SF / _GATE_SF
    unled, thin = [], []
    for name, sql in _registry().items():
        if name in NONVACUOUS_SKIP_HEAVY:
            continue
        narrow = [inner for inner, wide in _sum_sites(sql) if not wide]
        ledger = WINDOWED_SUM_LEDGER.get(name, [])
        if narrow and not ledger:
            unled.append((name, narrow[0][:60]))
            continue
        if not narrow and name in WINDOWED_SUM_LEDGER:
            unled.append((name, "ledger entry but no narrow sum left"))
        for entry in ledger:
            if entry[0] in ("col", "keybound"):
                _, col, n = entry
                mx = con.execute(
                    f'SELECT MAX(ABS("{col}")) FROM ({sql})'
                ).fetchone()[0]
                mag = float(mx or 0) * (10 ** n)
                if entry[0] == "keybound":
                    # per-key magnitude is SF-invariant; only the
                    # safety factor applies
                    mag /= scale
            elif entry[0] == "avg":
                _, col, cnt, n = entry
                mx = con.execute(
                    f'SELECT MAX(ABS("{col}" * "{cnt}")) FROM ({sql})'
                ).fetchone()[0]
                mag = float(mx or 0) * (10 ** n)
            else:
                _, probe, n = entry
                mx = con.execute(probe).fetchone()[0]
                mag = float(mx or 0) * (10 ** n)
            if mag * scale * _SAFETY >= limit:
                thin.append((name, entry, f"{mag:.3g}*{scale:.0e}"))
    assert not unled, (
        "narrow quantized sums in windowed oracles without a headroom "
        f"ledger entry (add one or go wide): {unled}"
    )
    assert not thin, (
        "BIGINT accumulators that overflow at the declared 100 TB "
        f"scale — switch to fsum(..., wide=True): {thin}"
    )


def test_windowed_queries_are_nonvacuous_at_smallest_sf(con):
    """A driver row that returns 0 rows passes its hash vacuously and
    asserts nothing — dedup_exact and customers_without_orders rode
    that for 11 rounds (r12 fix; same rule that rotated
    embedding_near_dup_pairs out in r8). Every windowed oracle must
    produce rows at the SMALLEST SF unless the empty set is the
    documented assertion."""
    bad = []
    for name, sql in _windowed_oracles().items():
        if name in NONVACUOUS_WHITELIST or name in NONVACUOUS_SKIP_HEAVY:
            continue
        # LIMIT-1 probe: existence is the assertion, and DuckDB
        # short-circuits the pipeline (COUNT(*) over the heavy ANN
        # replay oracles cost ~7 min; this runs in seconds)
        n = con.execute(
            f"SELECT COUNT(*) FROM (SELECT * FROM ({sql}) LIMIT 1)"
        ).fetchone()[0]
        if n == 0:
            bad.append(name)
    assert not bad, f"vacuous driver rows at {SF_DIR}: {bad}"


def test_fsum_int_wide_null_sum_matches_duckdb(spark, con):
    """r14 review finding: the wide-path overflow guard raised
    assert_true(NULL) on an empty/all-NULL input while DuckDB's
    CAST(NULL AS BIGINT) returns NULL — the exact engine-divergence
    class the guard exists to kill. Both engines must return NULL."""
    from pyspark.sql import functions as F

    from onehouse_demos_spark.functions.quantize import (
        fsum_int,
        fsum_int_sql,
    )

    empty = spark.createDataFrame([], "x double")
    row = empty.agg(fsum_int(F.col("x"), 4, wide=True).alias("s")).first()
    assert row.s is None
    duck = con.execute(
        f"SELECT {fsum_int_sql('x', 4, wide=True)} AS s "
        "FROM (SELECT 1.0 AS x WHERE FALSE)"
    ).fetchone()[0]
    assert duck is None
