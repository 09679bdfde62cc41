"""Model security: access gates, row-level filters, field visibility.

Re-expression of the reference's ``core/security.py``: a
``SecurityPolicy`` declares an ``access`` gate (bool or Jinja boolean
over the ``user`` namespace) plus ``row_filters`` (SQL templates over
``user``, AND-ed into the owning model's CTE before joins).  Rendering
uses ``StrictUndefined`` so a filter referencing a missing user
attribute raises instead of silently widening access.

On Spark the row filters land in the model CTE's WHERE, which Catalyst
pushes into the parquet scan — row-level security costs nothing extra
at 100 TB because the filter prunes at the source.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class SecurityError(Exception):
    pass


_env = None


def _jinja_env():
    global _env
    if _env is None:
        from jinja2 import Environment, StrictUndefined

        _env = Environment(autoescape=False, undefined=StrictUndefined)
    return _env


@dataclass
class SecurityPolicy:
    """Access gate + row-level filters (ref ``core/security.py:40``)."""

    access: bool | str = True
    row_filters: list[str] = field(default_factory=list)

    def check_access(self, model_name: str, user: dict | None) -> None:
        if self.access is True:
            return
        if self.access is False:
            raise SecurityError(f"access to model {model_name!r} denied")
        rendered = render_template(self.access, user, ctx=f"model {model_name!r} access")
        if rendered.strip().lower() in ("", "false", "0", "none"):
            raise SecurityError(f"access to model {model_name!r} denied for this user")

    def rendered_row_filters(self, model_name: str, user: dict | None) -> list[str]:
        return [
            render_template(f, user, ctx=f"model {model_name!r} row filter")
            for f in self.row_filters
        ]


def render_template(template: str, user: dict | None, *, ctx: str) -> str:
    from jinja2 import TemplateError

    try:
        return _jinja_env().from_string(template).render(user=user or {})
    except TemplateError as exc:
        raise SecurityError(f"{ctx}: template error: {exc}") from exc


def enforce_field_visibility(graph, refs_by_kind: dict[str, list[str]]) -> None:
    """Reject references to ``public: false`` fields in any query clause
    (ref ``core/security.py`` ``enforce_field_visibility``): hidden
    fields must not leak through filters or ordering either."""
    from sidemantic_spark.sql.fragments import find_refs

    known = set(graph.models)
    for kind, refs in refs_by_kind.items():
        for ref in refs or []:
            for model_name, fld, _g in find_refs(ref, known):
                model = graph.models.get(model_name)
                if model is None:
                    continue
                d = model.dimension(fld)
                if d is not None and not d.public:
                    raise SecurityError(
                        f"dimension {model_name}.{fld} is not public ({kind})"
                    )
                m = model.metric(fld)
                if m is not None and not m.public:
                    raise SecurityError(
                        f"metric {model_name}.{fld} is not public ({kind})"
                    )
