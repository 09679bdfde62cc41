"""sidemantic_spark — a PySpark-native semantic/metrics layer.

A from-scratch re-expression of the capabilities of sidequery/sidemantic
(a semantic-layer compiler: semantic graph -> warehouse SQL) where Spark
is both the dialect target and the executor: semantic queries compile to
Spark SQL text and run via ``spark.sql(...)`` in-session.

Architecture (see SURVEY.md for the reference mapping):

- ``core.model``   — Model / Dimension / Metric / Relationship / Segment
- ``core.graph``   — SemanticGraph with BFS join-path discovery
- ``sql.generator``— semantic query -> Spark SQL text compiler
- ``core.layer``   — SparkSemanticLayer: registry + compile + execute
- ``operators``    — large-scale data-pipeline operators (dedup,
  similarity search, text analysis, multimodal plumbing) built on the
  DataFrame API
"""

from sidemantic_spark.core.model import (
    Dimension,
    Metric,
    Model,
    Relationship,
    Segment,
)
from sidemantic_spark.core.graph import SemanticGraph
from sidemantic_spark.core.layer import SparkSemanticLayer

__version__ = "0.1.0"

__all__ = [
    "Dimension",
    "Metric",
    "Model",
    "Relationship",
    "Segment",
    "SemanticGraph",
    "SparkSemanticLayer",
]
