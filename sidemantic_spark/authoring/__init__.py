"""Authoring formats: native YAML, semantic-SQL DDL, Python registry.

Reference surfaces (SURVEY.md §1.3): native YAML
(``adapters/sidemantic.py``), SQL DDL statements (``MODEL (...)``,
``DIMENSION (...)`` — ``core/dialect.py``, ``core/sql_definitions.py``),
Python classes with context-manager auto-registration
(``core/registry.py:62``), inheritance via ``extends``
(``core/inheritance.py:11``).
"""

from sidemantic_spark.authoring.yaml_io import (
    AuthoringError,
    export_yaml,
    load_path,
    load_yaml,
)
from sidemantic_spark.authoring.sql_defs import load_sql_definitions
from sidemantic_spark.authoring.loaders import (
    FormatDetectionError,
    detect_yaml_format,
    load_from_directory,
)

__all__ = [
    "AuthoringError",
    "export_yaml",
    "load_path",
    "load_yaml",
    "load_sql_definitions",
    "FormatDetectionError",
    "detect_yaml_format",
    "load_from_directory",
]
