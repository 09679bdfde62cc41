"""Replay the reference's vendored Yardstick measures corpus.

``tests/fixtures/sql/yardstick/measures.test`` in the reference checkout
is the upstream sqllogictest for Julian Hyde's "Measures in SQL"
semantics (AS MEASURE views, AGGREGATE(), AT context modifiers). This
replays every statement and query end-to-end on Spark through the
Yardstick importer + semantic-SQL rewriter and compares expected rows.

ALL 115 of 115 queries replay exactly (round 9; 98 in round 8 — the
round-9 additions: window measures with the reference's
multiple-values runtime contract, ::VARCHAR postfix casts,
generate_series table-function sources, CTE-bodied views, NULL
projections, scalar subqueries without FROM, CURRENT-shift without
the selected dim, array-typed columns, SELECT-* measure views,
AT+HAVING, correlated row-vs-measure WHERE, the paper Listing-8
visibility semantics with ROLLUP totals, plain-table ad-hoc join
bridges, and USING joins). KNOWN_UNSUPPORTED is EMPTY — any
regression on any corpus query fails this test.

Skipped wholesale when the reference checkout isn't present.
"""

from __future__ import annotations

import os
import re

import pytest

CORPUS = "/root/reference/tests/fixtures/sql/yardstick/measures.test"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CORPUS), reason="reference corpus not present"
)

KNOWN_UNSUPPORTED: set[int] = set()

TYPE_MAP = {"INT": "INT", "INTEGER": "INT", "BIGINT": "BIGINT",
            "TEXT": "STRING", "VARCHAR": "STRING", "DOUBLE": "DOUBLE",
            "FLOAT": "DOUBLE", "DATE": "DATE", "TIMESTAMP": "TIMESTAMP",
            "BOOLEAN": "BOOLEAN", "DECIMAL": "DECIMAL(18,3)"}

def parse_slt(text):
    blocks, lines = [], text.splitlines()
    i = 0
    while i < len(lines):
        ln = lines[i].strip()
        if not ln or ln.startswith("#") or ln.startswith("require"):
            i += 1; continue
        if ln.startswith("statement"):
            expect_err = "error" in ln
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() and not lines[i].startswith("----"):
                sql_lines.append(lines[i]); i += 1
            # error blocks may carry expected message after ----
            if i < len(lines) and lines[i].startswith("----"):
                i += 1
                while i < len(lines) and lines[i].strip():
                    i += 1
            blocks.append(("statement", "\n".join(sql_lines), expect_err, None, None))
        elif ln.startswith("query"):
            parts = ln.split()
            rowsort = "rowsort" in parts
            i += 1
            sql_lines = []
            while i < len(lines) and not lines[i].startswith("----"):
                sql_lines.append(lines[i]); i += 1
            i += 1  # ----
            expected = []
            while i < len(lines) and lines[i].strip():
                expected.append(lines[i]); i += 1
            blocks.append(("query", "\n".join(sql_lines), False, expected, rowsort))
        else:
            i += 1
    return blocks

def run(spark, layer, blocks, limit=None, verbose=False):
    from sidemantic_spark.adapters.yardstick import YardstickAdapter
    import pyspark.sql.functions as F
    schemas = {}   # table -> [(col, type)]
    passed = failed = skipped = 0
    failures = []
    for bi, (kind, sql, expect_err, expected, rowsort) in enumerate(blocks[:limit]):
        s = sql.strip().rstrip(";")
        try:
            if kind == "statement":
                m = re.match(r"CREATE TABLE (\w+)\s*\((.*)\)\s*$", s, re.S | re.I)
                if m:
                    name, colspec = m.group(1), m.group(2)
                    cols = []
                    for item in re.split(r",(?![^()]*\))", colspec):
                        item = item.strip()
                        cm = re.match(r"(\w+)\s+([\w\[\]]+)", item)
                        typ = cm.group(2).upper()
                        if typ.endswith("[]"):  # DuckDB array column type
                            typ = f"ARRAY<{TYPE_MAP.get(typ[:-2], typ[:-2])}>"
                        else:
                            typ = TYPE_MAP.get(typ, typ)
                        cols.append((cm.group(1), typ))
                    schemas[name] = cols
                    continue
                m = re.match(r"INSERT INTO (\w+)\s+VALUES\s*(.*)$", s, re.S | re.I)
                if m:
                    name, vals = m.group(1), m.group(2)
                    # DuckDB array literals -> Spark array() calls
                    vals = re.sub(r"\[([^\]]*)\]", r"array(\1)", vals)
                    cols = schemas[name]
                    sel = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in cols)
                    df = spark.sql(f"SELECT {sel} FROM (SELECT * FROM VALUES {vals} AS t({', '.join(c for c,_ in cols)}))")
                    try:
                        old = spark.table(name)
                        df = old.unionByName(df)
                    except Exception:
                        pass
                    df.createOrReplaceTempView(name)
                    continue
                if re.match(r"CREATE (OR REPLACE )?VIEW", s, re.I) and re.search(r"AS\s+MEASURE", s, re.I):
                    YardstickAdapter().parse_text(layer, s + ";")
                    continue
                if re.match(r"CREATE (OR REPLACE )?VIEW", s, re.I):
                    spark.sql(s)
                    continue
                if expect_err:
                    try:
                        res = layer.sql(s) if s.upper().startswith("SEMANTIC") else spark.sql(s)
                        # `statement error` covers runtime errors too
                        # (e.g. 'Window measure ... returned multiple
                        # values' raises on execution, not compile)
                        if hasattr(res, "collect"):
                            res.collect()
                        failures.append((bi, "expected error, none", s[:80]))
                        failed += 1
                    except Exception:
                        passed += 1
                    continue
                spark.sql(s)
                continue
            # query
            semanticish = s.upper().startswith("SEMANTIC") or (
                re.search(r"\bAGGREGATE\s*\(", s, re.I)
                or any(re.search(rf"\b(?:FROM|JOIN)\s+{m}\b", s, re.I)
                       for m in layer.graph.models))
            df = layer.sql(s) if semanticish else spark.sql(s)
            rows = df.collect()
            got = []
            for r in rows:
                got.append([fmt(v) for v in r])
            want = [e.split("\t") for e in expected]
            if rowsort:
                got = sorted(got); want = sorted(want)
            def cells_eq(a, b):
                if a == b: return True
                try:
                    fa, fb = float(a), float(b)
                    return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
                except (ValueError, TypeError):
                    return False
            def rows_eq(g, w):
                return len(g) == len(w) and all(
                    len(gr) == len(wr) and all(cells_eq(a, b) for a, b in zip(gr, wr))
                    for gr, wr in zip(g, w))
            if rows_eq(got, want):
                passed += 1
            else:
                failed += 1
                failures.append((bi, s[:100].replace("\n"," "), f"got={got[:4]} want={want[:4]}"))
        except Exception as e:
            failed += 1
            failures.append((bi, s[:100].replace("\n", " "), f"{type(e).__name__}: {str(e)[:120]}"))
    return passed, failed, skipped, failures

def fmt(v):
    import datetime as _dt
    if v is None: return "NULL"
    if isinstance(v, _dt.datetime):
        s = v.isoformat(sep=" ")
        return s[:-9] if s.endswith(" 00:00:00") else s
    if isinstance(v, _dt.date): return v.isoformat()
    if isinstance(v, bool): return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v): return f"{v:.1f}"
        return repr(v)
    from decimal import Decimal
    if isinstance(v, Decimal):
        f = float(v)
        return f"{f:.1f}" if f == int(f) else repr(f)
    return str(v)



@pytest.fixture(scope="module")
def corpus_result(spark):
    from sidemantic_spark.core.layer import SparkSemanticLayer

    layer = SparkSemanticLayer(spark)
    blocks = parse_slt(open(CORPUS).read())
    passed, failed, _sk, failures = run(spark, layer, blocks)
    return blocks, passed, failures


def test_yardstick_corpus_replay(corpus_result):
    blocks, passed, failures = corpus_result
    fail_idx = {bi for bi, _q, _m in failures}
    unexpected_fail = sorted(fail_idx - KNOWN_UNSUPPORTED)
    unexpected_pass = sorted(KNOWN_UNSUPPORTED - fail_idx)
    detail = {bi: (q, m) for bi, q, m in failures}
    assert not unexpected_fail, [
        (bi, detail[bi][0][:90], detail[bi][1][:120]) for bi in unexpected_fail]
    # a construct starting to pass should shrink the pinned list
    assert not unexpected_pass, unexpected_pass
    assert passed >= 115
