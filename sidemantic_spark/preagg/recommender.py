"""Pre-aggregation recommender: query-pattern analysis -> rollup specs.

Re-expression of the reference's ``core/preagg_recommender.py:11-381``:
parse the instrumentation comments of compiled queries (or a layer's
in-memory query log), aggregate (model, metrics, dimensions, grains)
patterns, score them, and emit ready-to-attach ``PreAggregation``
specs. Queries already served by a rollup are excluded so existing
pre-aggregations don't keep re-recommending themselves.

Scoring is metadata-only (no data scans): frequency dominates; simple
additive measure sets score higher (they re-aggregate cleanly at any
grain), exact count_distinct lowers the score (exact-grain-only
derivability).
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass

from sidemantic_spark.preagg.matcher import PreAggregation

_META_RE = re.compile(r"--\s*sidemantic_spark\s+(.+)")
_GRAIN_ORDER = ["second", "minute", "hour", "day", "week", "month", "quarter", "year"]


@dataclass(frozen=True)
class QueryPattern:
    model: str
    metrics: frozenset
    dimensions: frozenset  # dimension names on the model
    granularities: frozenset


@dataclass
class PreAggRecommendation:
    pattern: QueryPattern
    preagg: PreAggregation
    query_count: int
    benefit_score: float


class PreAggregationRecommender:
    def __init__(self, graph, min_query_count: int = 10, min_benefit_score: float = 0.0):
        self.graph = graph
        self.min_query_count = min_query_count
        self.min_benefit_score = min_benefit_score
        self.patterns: Counter = Counter()

    # -- ingestion ----------------------------------------------------

    def parse_query_log(self, queries: list[str]) -> None:
        for q in queries:
            p = self._extract_pattern(q)
            if p is not None:
                self.patterns[p] += 1

    def record(self, sql: str) -> None:
        self.parse_query_log([sql])

    def _extract_pattern(self, query: str) -> QueryPattern | None:
        m = _META_RE.search(query)
        if not m:
            return None
        parts: dict[str, str] = {}
        for tok in m.group(1).split():
            if "=" in tok:
                k, v = tok.split("=", 1)
                parts[k] = v
        if parts.get("used_preagg"):
            return None  # already served by a rollup
        models = [x for x in parts.get("models", "").split(",") if x]
        metrics = [x for x in parts.get("metrics", "").split(",") if x]
        dims = [x for x in parts.get("dimensions", "").split(",") if x]
        grains = [x for x in parts.get("granularities", "").split(",") if x]
        if len(models) != 1 or not metrics:
            return None  # multi-model queries can't route to a rollup
        model = models[0]
        if any(not r.startswith(f"{model}.") for r in metrics + dims):
            return None
        return QueryPattern(
            model=model,
            metrics=frozenset(r.split(".", 1)[1] for r in metrics),
            dimensions=frozenset(r.split(".", 1)[1] for r in dims),
            granularities=frozenset(grains),
        )

    # -- recommendation -----------------------------------------------

    def get_recommendations(self, top_n: int | None = None) -> list[PreAggRecommendation]:
        out: list[PreAggRecommendation] = []
        for pattern, count in self.patterns.items():
            if count < self.min_query_count:
                continue
            preagg = self._to_preagg(pattern)
            if preagg is None:
                continue
            score = self._benefit_score(pattern, count)
            if score < self.min_benefit_score:
                continue
            out.append(PreAggRecommendation(pattern, preagg, count, score))
        out.sort(key=lambda r: (-r.benefit_score, -r.query_count, r.preagg.name))
        return out[:top_n] if top_n else out

    def apply(self, recommendation: PreAggRecommendation) -> PreAggregation:
        """Attach the recommended rollup to its model."""
        model = self.graph.get_model(recommendation.pattern.model)
        if any(p.name == recommendation.preagg.name for p in model.pre_aggregations):
            return recommendation.preagg
        model.pre_aggregations.append(recommendation.preagg)
        self.graph._invalidate()
        return recommendation.preagg

    def _to_preagg(self, pattern: QueryPattern) -> PreAggregation | None:
        model = self.graph.models.get(pattern.model)
        if model is None:
            return None
        measures, dims, time_dim = [], [], None
        for mname in sorted(pattern.metrics):
            metric = model.metric(mname)
            if metric is None or not metric.is_simple:
                return None  # complex metrics route through other plans
            measures.append(mname)
        for dname in sorted(pattern.dimensions):
            d = model.dimension(dname)
            if d is None:
                return None
            if d.type == "time":
                time_dim = dname
            else:
                dims.append(dname)
        # finest queried grain keeps every observed grain derivable
        grain = "day"
        observed = [g for g in _GRAIN_ORDER if g in pattern.granularities]
        if observed:
            grain = observed[0]
        name = "_".join(["rec"] + dims + ([f"{time_dim}_{grain}"] if time_dim else []))[:64]
        return PreAggregation(
            name=name or "rec",
            measures=measures,
            dimensions=dims,
            time_dimension=time_dim,
            granularity=grain,
            partition_granularity="month" if time_dim else None,
        )

    def _benefit_score(self, pattern: QueryPattern, count: int) -> float:
        model = self.graph.models.get(pattern.model)
        score = min(count / 100.0, 1.0) * 0.6
        # narrow rollups (few dims) compress better
        score += max(0.0, (6 - len(pattern.dimensions)) / 6) * 0.2
        # additive measure sets re-aggregate at any grain
        additive = True
        if model is not None:
            for mname in pattern.metrics:
                metric = model.metric(mname)
                if metric is not None and metric.agg in ("count_distinct", "median"):
                    additive = False
        score += 0.2 if additive else 0.05
        return round(score, 4)
