"""Broad-exception policy guard in high-risk parse/runtime paths
(mirrors reference ``tests/core/test_exception_boundaries.py``): a bare
``except:`` / ``except Exception`` in the SQL compiler or the strict
adapters can silently turn a wrong answer into a fallback. Broad
catches are allowed only at protocol boundaries (the HTTP handler,
which logs and answers 500) and at documented best-effort spots.
"""

import ast
import os

ROOT = os.path.join(os.path.dirname(__file__), "..")

NO_BROAD_CATCH_PATHS = (
    "sidemantic_spark/sql/generator.py",
    "sidemantic_spark/sql/rewriter.py",
    "sidemantic_spark/sql/fragments.py",
    "sidemantic_spark/sql/table_calcs.py",
    "sidemantic_spark/core/migrator.py",
    "sidemantic_spark/core/security.py",
    "sidemantic_spark/core/transport_security.py",
    "sidemantic_spark/adapters/graphene.py",
    "sidemantic_spark/adapters/metricflow.py",
    "sidemantic_spark/adapters/osi.py",
    "sidemantic_spark/adapters/rill.py",
)


def _is_broad(handler: ast.ExceptHandler) -> bool:
    t = handler.type
    if t is None:
        return True
    if isinstance(t, ast.Name):
        return t.id == "Exception"
    if isinstance(t, ast.Tuple):
        return any(isinstance(e, ast.Name) and e.id == "Exception" for e in t.elts)
    return False


def _broad_handlers(rel: str) -> list[int]:
    with open(os.path.join(ROOT, rel)) as f:
        tree = ast.parse(f.read(), filename=rel)
    return [n.lineno for n in ast.walk(tree)
            if isinstance(n, ast.ExceptHandler) and _is_broad(n)]


def test_high_risk_paths_have_no_broad_catches():
    violations = {p: _broad_handlers(p) for p in NO_BROAD_CATCH_PATHS
                  if _broad_handlers(p)}
    assert violations == {}


def test_http_boundary_broad_catch_logs_and_answers_500():
    """The one allowed broad catch: the HTTP POST protocol boundary must
    log and return a 500 that does NOT leak the exception message."""
    rel = "sidemantic_spark/server/http_api.py"
    with open(os.path.join(ROOT, rel)) as f:
        src = f.read()
    tree = ast.parse(src, filename=rel)
    broad = [n for n in ast.walk(tree)
             if isinstance(n, ast.ExceptHandler) and _is_broad(n)]
    assert len(broad) == 1
    body_src = ast.get_source_segment(src, broad[0])
    assert "500" in body_src and "exception" in body_src  # logged + 500
    assert "{exc}" not in body_src  # message not echoed to the client
