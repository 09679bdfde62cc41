"""Randomized AT-modifier semantics fuzz.

Generates random Yardstick queries (dims subset x modifier chains x
optional visible WHERE) over a small 3-dimensional fixture and checks
every row against an INDEPENDENT pandas implementation of the paper
semantics: the measure value of an output row is the SUM over the
context rows selected by (query WHERE if visible) + AT preds + equality
on the surviving correlated dims.  The corpus pins fixed shapes; this
covers their compositions.  Seeded RNG — fully deterministic.
"""

from __future__ import annotations

import itertools
import random

import pytest

DIMS = ["year", "region", "category"]
ROWS = [
    (2022, "US", "A", 100.0), (2022, "US", "B", 50.0),
    (2022, "EU", "A", 80.0), (2022, "EU", "B", 40.0),
    (2023, "US", "A", 120.0), (2023, "US", "B", 60.0),
    (2023, "EU", "A", 100.0), (2023, "EU", "B", 50.0),
    (2024, "US", "A", 30.0),
]
WHERE_PREDS = [
    ("region = 'US'", lambda r: r[1] == "US"),
    ("year = 2022", lambda r: r[0] == 2022),
    ("year > 2022", lambda r: r[0] > 2022),
    ("region = 'US' OR year = 2022", lambda r: r[1] == "US" or r[0] == 2022),
]
SET_PINS = [
    ("year", "2022", lambda r: r[0] == 2022),
    ("region", "'EU'", lambda r: r[1] == "EU"),
    ("category", "'A'", lambda r: r[2] == "A"),
]


@pytest.fixture(scope="module")
def fuzz_layer(spark):
    from sidemantic_spark.adapters.yardstick import YardstickAdapter
    from sidemantic_spark.core.layer import SparkSemanticLayer

    values = ",".join(f"({y},'{rg}','{c}',{a})" for y, rg, c, a in ROWS)
    spark.sql(
        f"SELECT * FROM VALUES {values} AS t(year, region, category, amount)"
    ).createOrReplaceTempView("fz_products")
    lyr = SparkSemanticLayer(spark)
    YardstickAdapter().parse_text(lyr, """
CREATE VIEW fz_products_v AS
SELECT year, region, category, SUM(amount) AS MEASURE revenue
FROM fz_products;
""")
    return lyr


def expected_value(out_row, sel_dims, mods, visible_filter):
    """Independent implementation of the engine's documented modifier
    contract (each rule corpus-validated): the context = rows passing
    (the query WHERE when visible) + AT preds + equality on surviving
    correlated dims.  AGGREGATE defaults to visible; any SET turns
    visibility off; bare ALL resets dims, preds AND visibility; a
    single lone WHERE modifier evaluates non-correlated."""
    active = list(sel_dims)
    preds = []
    visible = not any(kind == "set" for kind, _p in mods)
    if len(mods) == 1 and mods[0][0] == "where":
        active = []
    for kind, payload in mods:
        if kind == "all_bare":
            active, preds, visible = [], [], False
        elif kind == "all":
            active = [d for d in active if d not in payload]
        elif kind == "where":
            preds.append(payload[1])
        elif kind == "set":
            dim, _lit, fn = payload
            active = [d for d in active if d != dim]
            preds.append(fn)
    total = 0.0
    matched = False
    for r in ROWS:
        if visible and visible_filter is not None and not visible_filter(r):
            continue
        if any(not p(r) for p in preds):
            continue
        ok = True
        for d in active:
            di = DIMS.index(d)
            if r[di] != out_row[d]:
                ok = False
                break
        if not ok:
            continue
        total += r[3]
        matched = True
    return total if matched else None


def test_at_semantics_fuzz(fuzz_layer):
    rng = random.Random(20260816)
    n_checked = 0
    for case in range(60):
        k = rng.randint(1, 3)
        sel_dims = sorted(rng.sample(DIMS, k))
        # random modifier chain (1-2 modifiers)
        mods = []
        for _ in range(rng.randint(1, 2)):
            kind = rng.choice(["all_bare", "all", "where", "set"])
            if kind == "all_bare":
                mods.append(("all_bare", None))
            elif kind == "all":
                targets = rng.sample(sel_dims, rng.randint(1, len(sel_dims)))
                mods.append(("all", targets))
            elif kind == "where":
                mods.append(("where", rng.choice(WHERE_PREDS)))
            else:
                mods.append(("set", rng.choice(SET_PINS)))
        use_where = rng.random() < 0.4
        visible = rng.choice(WHERE_PREDS) if use_where else None

        at_txt = " ".join(
            "AT (ALL)" if kind == "all_bare"
            else f"AT (ALL {' '.join(p)})" if kind == "all"
            else f"AT (WHERE {p[0]})" if kind == "where"
            else f"AT (SET {p[0]} = {p[1]})"
            for kind, p in mods
        )
        sql = (
            "SEMANTIC SELECT "
            + ", ".join(sel_dims)
            + f", AGGREGATE(revenue) {at_txt} AS v FROM fz_products_v"
            + (f" WHERE {visible[0]}" if visible else "")
        )
        try:
            rows = fuzz_layer.sql(sql).collect()
        except Exception as exc:  # pragma: no cover - fail loudly
            raise AssertionError(f"case {case}: {sql!r} failed: {exc}")
        assert rows, f"case {case}: {sql!r} returned no rows"
        for r in rows:
            out = {d: r[d] for d in sel_dims}
            want = expected_value(out, sel_dims, mods, visible[1] if visible else None)
            got = None if r["v"] is None else float(r["v"])
            assert got == want, (
                f"case {case}: {sql!r} row {out}: got {got}, want {want}"
            )
            n_checked += 1
    assert n_checked > 200  # the fuzz actually exercised many rows


def test_at_all_chain_exhaustive(fuzz_layer):
    """Every ALL-subset over three dims: the AT value must equal the
    SUM over the context grouped by the complement subset."""
    for drop in itertools.chain.from_iterable(
        itertools.combinations(DIMS, n) for n in range(1, 4)
    ):
        sql = (
            "SEMANTIC SELECT year, region, category, "
            f"AGGREGATE(revenue) AT (ALL {' '.join(drop)}) AS v "
            "FROM fz_products_v"
        )
        rows = fuzz_layer.sql(sql).collect()
        keep = [d for d in DIMS if d not in drop]
        for r in rows:
            want = sum(
                row[3] for row in ROWS
                if all(row[DIMS.index(d)] == r[d] for d in keep)
            )
            assert float(r["v"]) == want, (drop, dict(r.asDict()))


# -- round-10: window-measure x grouping-context fuzz (VERDICT r9 #5) --

WROWS = [
    (2021, "US", 10.0), (2022, "US", 20.0), (2023, "US", 30.0),
    (2021, "EU", 5.0), (2022, "EU", 15.0), (2023, "EU", 25.0),
    (2022, "US", 7.0),  # year-peer inside US: RANGE frame includes peers
]
WDIMS = ["year", "region"]
W_PREDS = [
    ("year = 2022", lambda r: r[0] == 2022),
    ("year > 2021", lambda r: r[0] > 2021),
    ("region = 'US'", lambda r: r[1] == "US"),
    ("region = 'US' OR year = 2022", lambda r: r[1] == "US" or r[0] == 2022),
]
W_SET_PINS = [
    ("year", "2022", lambda r: r[0] == 2022),
    ("region", "'EU'", lambda r: r[1] == "EU"),
]


def _win_val(row, ctx, measure):
    """Window value of `row` evaluated over the filtered base `ctx` —
    independent reimplementation of the view definitions below.
    run_total: SUM OVER (PARTITION BY region ORDER BY year) with the
    default RANGE frame (year-peers included); reg_total: SUM OVER
    (PARTITION BY region)."""
    if measure == "reg_total":
        return sum(a for y, rg, a in ctx if rg == row[1])
    return sum(a for y, rg, a in ctx if rg == row[1] and y <= row[0])


@pytest.fixture(scope="module")
def window_fuzz_layer(spark):
    from sidemantic_spark.adapters.yardstick import YardstickAdapter
    from sidemantic_spark.core.layer import SparkSemanticLayer

    values = ",".join(f"({y},'{rg}',{a})" for y, rg, a in WROWS)
    spark.sql(
        f"SELECT * FROM VALUES {values} AS t(year, region, amount)"
    ).createOrReplaceTempView("wf_base")
    lyr = SparkSemanticLayer(spark)
    YardstickAdapter().parse_text(lyr, """
CREATE VIEW wf_run_v AS
SELECT year, region,
       SUM(amount) OVER (PARTITION BY region ORDER BY year) AS MEASURE run_total
FROM wf_base;
CREATE VIEW wf_reg_v AS
SELECT year, region,
       SUM(amount) OVER (PARTITION BY region) AS MEASURE reg_total
FROM wf_base;
""")
    return lyr


def _window_expected(sel_dims, mods, visible_filter, measure):
    """(per-output-row values, expect_error): the sub-context's rows =
    (query WHERE if visible) + AT preds; window values evaluate over
    THAT filtered base; the sub then groups by the surviving correlated
    dims asserting ONE distinct value per group (raise_error fires for
    ANY multi-valued sub group, matched by the join or not)."""
    active = list(sel_dims)
    preds = []
    visible = not any(kind == "set" for kind, _p in mods)
    if len(mods) == 1 and mods[0][0] == "where":
        active = []
    for kind, payload in mods:
        if kind == "all_bare":
            active, preds, visible = [], [], False
        elif kind == "all":
            active = [d for d in active if d not in payload]
        elif kind == "where":
            preds.append(payload[1])
        else:
            dim, _lit, fn = payload
            active = [d for d in active if d != dim]
            preds.append(fn)
    ctx = [
        r for r in WROWS
        if (not visible or visible_filter is None or visible_filter(r))
        and all(p(r) for p in preds)
    ]
    # sub groups over the surviving dims: >1 distinct window value in
    # ANY group = data-dependent runtime error
    groups: dict[tuple, set] = {}
    for r in ctx:
        key = tuple(r[WDIMS.index(d)] for d in active)
        groups.setdefault(key, set()).add(_win_val(r, ctx, measure))
    if any(len(v) > 1 for v in groups.values()):
        return None, True

    def value_for(out_row):
        key = tuple(out_row[d] for d in active)
        vals = groups.get(key)
        return next(iter(vals)) if vals else None

    return value_for, False


def test_window_measure_at_fuzz(window_fuzz_layer):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    rng = random.Random(20260817)
    n_value_rows = 0
    n_error_cases = 0
    for case in range(50):
        measure = rng.choice(["run_total", "reg_total"])
        view = "wf_run_v" if measure == "run_total" else "wf_reg_v"
        k = rng.randint(1, 2)
        sel_dims = sorted(rng.sample(WDIMS, k))
        mods = []
        for _ in range(rng.randint(1, 2)):
            kind = rng.choice(["all_bare", "all", "where", "set"])
            if kind == "all_bare":
                mods.append(("all_bare", None))
            elif kind == "all":
                targets = rng.sample(sel_dims, rng.randint(1, len(sel_dims)))
                mods.append(("all", targets))
            elif kind == "where":
                mods.append(("where", rng.choice(W_PREDS)))
            else:
                mods.append(("set", rng.choice(W_SET_PINS)))
        use_where = rng.random() < 0.4
        visible = rng.choice(W_PREDS) if use_where else None

        at_txt = " ".join(
            "AT (ALL)" if kind == "all_bare"
            else f"AT (ALL {' '.join(p)})" if kind == "all"
            else f"AT (WHERE {p[0]})" if kind == "where"
            else f"AT (SET {p[0]} = {p[1]})"
            for kind, p in mods
        )
        sql = (
            "SEMANTIC SELECT "
            + ", ".join(sel_dims)
            + f", AGGREGATE({measure}) {at_txt} AS v FROM {view}"
            + (f" WHERE {visible[0]}" if visible else "")
        )
        value_for, expect_error = _window_expected(
            sel_dims, mods, visible[1] if visible else None, measure
        )
        if expect_error:
            with pytest.raises((SparkRuntimeException, Py4JJavaError),
                               match="multiple values"):
                window_fuzz_layer.sql(sql).collect()
            n_error_cases += 1
            continue
        try:
            rows = window_fuzz_layer.sql(sql).collect()
        except Exception as exc:  # pragma: no cover - fail loudly
            raise AssertionError(f"case {case}: {sql!r} failed: {exc}")
        assert rows, f"case {case}: {sql!r} returned no rows"
        for r in rows:
            out = {d: r[d] for d in sel_dims}
            want = value_for(out)
            got = None if r["v"] is None else float(r["v"])
            assert got == want, (
                f"case {case}: {sql!r} row {out}: got {got}, want {want}"
            )
            n_value_rows += 1
    # both contract paths must actually be exercised
    assert n_value_rows > 40, n_value_rows
    assert n_error_cases > 5, n_error_cases


# -- round-10: AT + HAVING composition fuzz (VERDICT r9 #5, 2nd half) --


def test_at_having_fuzz(fuzz_layer):
    """HAVING over AGGREGATE(...) AT terms: each HAVING term resolves
    to its matching at-context value (adding a hidden context when the
    select doesn't already compute it); the filter then applies to the
    joined pre-aggregated row. Oracle: expected_value for BOTH the
    select term and the HAVING term, then a plain Python filter."""
    rng = random.Random(20260818)
    n_rows = 0
    n_filtered_cases = 0
    for case in range(40):
        k_dims = rng.randint(1, 2)
        sel_dims = sorted(rng.sample(DIMS, k_dims))

        def rand_mods():
            mods = []
            for _ in range(rng.randint(1, 2)):
                kind = rng.choice(["all_bare", "all", "where", "set"])
                if kind == "all_bare":
                    mods.append(("all_bare", None))
                elif kind == "all":
                    mods.append(
                        ("all", rng.sample(sel_dims, rng.randint(1, len(sel_dims))))
                    )
                elif kind == "where":
                    mods.append(("where", rng.choice(WHERE_PREDS)))
                else:
                    mods.append(("set", rng.choice(SET_PINS)))
            return mods

        def mods_txt(mods):
            return " ".join(
                "AT (ALL)" if kind == "all_bare"
                else f"AT (ALL {' '.join(p)})" if kind == "all"
                else f"AT (WHERE {p[0]})" if kind == "where"
                else f"AT (SET {p[0]} = {p[1]})"
                for kind, p in mods
            )

        sel_mods = rand_mods()
        # HAVING term: 50% reuse the select term's modifiers (resolves
        # to the SAME context), 50% an independent chain (hidden ctx)
        hav_mods = sel_mods if rng.random() < 0.5 else rand_mods()
        use_where = rng.random() < 0.4
        visible = rng.choice(WHERE_PREDS) if use_where else None
        cutoff = rng.choice([40, 80, 120, 200])

        sql = (
            "SEMANTIC SELECT "
            + ", ".join(sel_dims)
            + f", AGGREGATE(revenue) {mods_txt(sel_mods)} AS v FROM fz_products_v"
            + (f" WHERE {visible[0]}" if visible else "")
            + f" HAVING AGGREGATE(revenue) {mods_txt(hav_mods)} > {cutoff}"
        )
        try:
            rows = fuzz_layer.sql(sql).collect()
        except Exception as exc:  # pragma: no cover - fail loudly
            raise AssertionError(f"case {case}: {sql!r} failed: {exc}")

        vf = visible[1] if visible else None
        # oracle: enumerate main-context output rows, compute both
        # terms, filter by the HAVING term
        main_rows = {}
        for r in ROWS:
            if vf is not None and not vf(r):
                continue
            key = tuple(r[DIMS.index(d)] for d in sel_dims)
            main_rows[key] = {d: r[DIMS.index(d)] for d in sel_dims}
        want = {}
        for key, out in main_rows.items():
            hv = expected_value(out, sel_dims, hav_mods, vf)
            if hv is None or not hv > cutoff:
                continue
            want[key] = expected_value(out, sel_dims, sel_mods, vf)
        got = {}
        for r in rows:
            key = tuple(r[d] for d in sel_dims)
            got[key] = None if r["v"] is None else float(r["v"])
        assert got == want, (
            f"case {case}: {sql!r}\n got {got}\nwant {want}"
        )
        n_rows += len(rows)
        if len(want) < len(main_rows):
            n_filtered_cases += 1
    assert n_rows > 40, n_rows
    assert n_filtered_cases > 10, n_filtered_cases  # HAVING actually bit
