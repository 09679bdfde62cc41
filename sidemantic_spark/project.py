"""Project discovery and config defaults (ref ``sidemantic/project.py``
+ ``config.py``).

A project is a directory holding a ``sidemantic-spark.yml`` (or
``sidemantic.yml``) config; CLI commands discover it upward from the
working directory so ``--models`` becomes optional inside a project.
Where the reference's config binds one of nine warehouse connections,
the Spark-native config instead carries Spark session settings and
table registrations — the session IS the connection:

```yaml
models_dir: models/           # model YAML / SQL-DDL directory
tables:                       # name -> data path registered as a view
  orders: data/orders.parquet
spark:                        # session conf applied at build time
  spark.sql.shuffle.partitions: "64"
preagg_path: .preagg/         # rollup storage root
```
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

CONFIG_NAMES = ("sidemantic-spark.yml", "sidemantic-spark.yaml",
                "sidemantic.yml", "sidemantic.yaml")


class ProjectResolutionError(ValueError):
    """Raised when a project/config cannot be resolved."""


def find_config(start: Path) -> Path | None:
    """Search upward from ``start`` for the first config file."""
    cur = start.resolve()
    for directory in [cur, *cur.parents]:
        for name in CONFIG_NAMES:
            candidate = directory / name
            if candidate.is_file():
                return candidate
    return None


def load_config(path: Path) -> dict[str, Any]:
    import yaml

    data = yaml.safe_load(path.read_text()) or {}
    if not isinstance(data, dict):
        raise ProjectResolutionError(f"{path}: config must be a mapping")
    return data


# -- raw data files (reference sidemantic/datafiles.py) ----------------------

DATA_FILE_SUFFIXES = {".csv", ".tsv", ".parquet", ".json", ".jsonl", ".ndjson"}

_SPARK_FORMATS = {
    ".csv": "csv", ".tsv": "csv", ".parquet": "parquet",
    ".json": "json", ".jsonl": "json", ".ndjson": "json",
}


def is_data_file(path: Path) -> bool:
    return path.suffix.lower() in DATA_FILE_SUFFIXES


def table_name_for(path: Path) -> str:
    """Sanitized lowercase view name for a raw data file (reference
    datafiles.py ``table_name_for``): non-identifier characters become
    underscores, a leading digit gets a ``t_`` prefix, and an empty
    residue falls back to ``data``."""
    import re

    stem = re.sub(r"[^A-Za-z0-9_]", "_", path.stem).lower()
    stem = stem.strip("_") or "data"
    if stem[0].isdigit():
        stem = f"t_{stem}"
    return stem


def discover_data_files(directory: Path) -> list[Path]:
    """Sorted data files directly under ``directory`` (reference
    datafiles.py ``discover_data_files``); missing dir -> empty."""
    if not directory.is_dir():
        return []
    return sorted(p for p in directory.iterdir() if p.is_file() and is_data_file(p))


def register_data_files(spark, files: list[Path]) -> dict[str, Path]:
    """Register each data file as a temp view under its sanitized name.
    Duplicate resolved names and unsupported suffixes are errors, not
    silent last-wins (reference build_file_views)."""
    views: dict[str, Path] = {}
    for p in files:
        fmt = _SPARK_FORMATS.get(p.suffix.lower())
        if fmt is None:
            raise ProjectResolutionError(f"unsupported data file: {p}")
        name = table_name_for(p)
        if name in views:
            raise ProjectResolutionError(
                f"data files {views[name].name!r} and {p.name!r} both "
                f"resolve to view {name!r}"
            )
        reader = spark.read.format(fmt)
        if fmt == "csv":
            reader = reader.options(
                header="true", inferSchema="true",
                sep="\t" if p.suffix.lower() == ".tsv" else ",",
            )
        reader.load(str(p)).createOrReplaceTempView(name)
        views[name] = p
    return views


@dataclass(frozen=True)
class ProjectContext:
    """Discovered project and its shared command defaults
    (ref project.py:108)."""

    start_dir: Path
    root: Path
    config_path: Path | None = None
    config: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def discover(
        cls,
        start_dir: str | Path | None = None,
        config_path: str | Path | None = None,
    ) -> "ProjectContext":
        start = Path(start_dir or Path.cwd()).expanduser().resolve()
        if not start.exists():
            raise ProjectResolutionError(f"Start directory not found: {start}")
        if start.is_file():
            start = start.parent
        if config_path is not None:
            # an explicitly requested config is authoritative: missing or
            # malformed is an error, not a warning + unrelated defaults
            selected = Path(config_path).expanduser()
            if not selected.is_absolute():
                selected = start / selected
            if not selected.is_file():
                raise ProjectResolutionError(f"Config file not found: {selected}")
        else:
            selected = find_config(start)
        if selected is None:
            return cls(start_dir=start, root=start)
        try:
            config = load_config(selected)
        except ProjectResolutionError:
            raise
        except Exception as exc:
            raise ProjectResolutionError(
                f"Could not load config {selected}: {exc}"
            ) from exc
        return cls(
            start_dir=start,
            root=selected.parent.resolve(),
            config_path=selected.resolve(),
            config=config,
        )

    def resolve_models(self, explicit: str | Path | None = None) -> Path:
        """CLI > config models_dir > conventional ``models/`` > root
        (ref project.py:resolve_models)."""
        if explicit is not None:
            p = Path(explicit).expanduser()
            if not p.is_absolute():
                p = self.start_dir / p
            if not p.exists():
                raise ProjectResolutionError(f"Models path not found: {p}")
            return p.resolve()
        if "models_dir" in self.config:
            p = self.root / str(self.config["models_dir"])
            if not p.exists():
                raise ProjectResolutionError(
                    f"Configured models path not found: {p}"
                )
            return p.resolve()
        conventional = self.root / "models"
        if conventional.is_dir():
            return conventional.resolve()
        if self.config_path is not None:
            # a config marks a real project root; scanning it is sane
            return self.root
        raise ProjectResolutionError(
            "no models path: pass -f/--models, or run inside a project "
            "(sidemantic-spark.yml with models_dir, or a models/ directory)"
        )

    def spark_conf(self) -> dict[str, str]:
        raw = self.config.get("spark") or {}
        return {str(k): str(v) for k, v in raw.items()}

    def tables(self) -> dict[str, Path]:
        """Configured table registrations resolved against the root."""
        out: dict[str, Path] = {}
        for name, rel in (self.config.get("tables") or {}).items():
            p = Path(str(rel))
            out[str(name)] = p if p.is_absolute() else (self.root / p)
        return out

    def preagg_path(self) -> Path | None:
        raw = self.config.get("preagg_path")
        if raw is None:
            return None
        p = Path(str(raw))
        return p if p.is_absolute() else (self.root / p)

    def apply(self, layer, spark=None) -> None:
        """Apply config defaults: runtime Spark conf, table
        registrations, preagg root.  Static conf keys (driver memory,
        master) cannot change on a live session and are skipped —
        set those via SPARK_GRAFT_* env instead."""
        session = spark or getattr(layer, "spark", None)
        if session is not None:
            for k, v in self.spark_conf().items():
                try:
                    session.conf.set(k, v)
                except Exception:
                    pass  # static conf on a running session
        if session is not None:
            for name, path in self.tables().items():
                suffix = path.suffix.lower().lstrip(".") or "parquet"
                reader = session.read.format("csv" if suffix == "csv" else suffix)
                if suffix == "csv":
                    reader = reader.options(header="true", inferSchema="true")
                reader.load(str(path)).createOrReplaceTempView(name)
            if not self.tables():
                # conventional data/ directory: every raw data file
                # auto-registers as a view under its sanitized name
                # (reference project.py + datafiles.py auto-discovery)
                register_data_files(
                    session, discover_data_files(self.root / "data")
                )
        pre = self.preagg_path()
        if pre is not None and getattr(layer, "preaggs", None) is not None:
            layer.preaggs.base_path = str(pre)
