"""Per-adapter key-coverage diff vs the reference's adapters.

For each adapter, extract the string keys the reference implementation
reads (``.get("k")`` / ``["k"]``) and report the ones the repo's
adapter never mentions. Raw output needs triage — the reference also
*writes* many keys (export-side metadata like ``bsl_*``), and several
parsers normalize case — so the checked-in triage lives in
ADAPTER_COVERAGE.md; this script regenerates the raw diff.

Usage: python scripts/adapter_key_coverage.py
"""
import re

PAIRS = {
    "atscale_sml.py": "atscale.py", "bsl.py": "bsl.py", "cube.py": "cube.py",
    "gooddata.py": "gooddata.py", "graphene.py": "graphene.py", "hex.py": "hex.py",
    "holistics.py": "holistics.py", "lookml.py": "lookml.py", "malloy.py": "malloy.py",
    "metricflow.py": "metricflow.py", "omni.py": "omni.py", "osi.py": "osi.py",
    "rill.py": "rill.py", "snowflake.py": "snowflake.py", "superset.py": "superset.py",
    "tableau.py": "tableau.py", "thoughtspot.py": "thoughtspot.py",
    "tmdl.py": "tmdl.py", "yardstick.py": "yardstick.py",
}
KEY_RE = re.compile(r'(?:\.get\(\s*|\[)["\']([a-zA-Z_][a-zA-Z0-9_]*)["\']')
GENERIC = {"name", "type", "sql", "label", "description", "title", "model",
           "table", "primary_key", "dimensions", "measures", "metrics",
           "filters", "meta", "value", "key", "field", "fields", "id",
           "kind", "format", "default", "expr", "expression", "alias",
           "column", "columns", "tables", "views", "models"}


def diff() -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for ref, repo in sorted(PAIRS.items()):
        ref_src = open(f"/root/reference/sidemantic/adapters/{ref}").read()
        repo_src = open(f"/root/repo/sidemantic_spark/adapters/{repo}").read()
        ref_keys = set(KEY_RE.findall(ref_src))
        missing = sorted(
            k for k in ref_keys
            if k not in GENERIC
            and not re.search(rf'["\']({k})["\']|\b{k}\b', repo_src)
        )
        if missing:
            out[repo] = missing
    return out


if __name__ == "__main__":
    for repo, missing in diff().items():
        print(f"{repo}: {len(missing)} unread reference keys: {missing}")
