"""Interactive workbench (ref ``sidemantic/workbench/``).

Split the same way as the widget: :class:`WorkbenchSession` is the
headless core (query execution, compile preview, model tree,
validation) shared by every front-end; the Textual TUI in
:mod:`sidemantic_spark.workbench.app` loads lazily and the CLI falls
back to the plain REPL when textual isn't installed.
"""

from __future__ import annotations

from sidemantic_spark.workbench.examples import EXAMPLE_QUERIES
from sidemantic_spark.workbench.session import WorkbenchSession

__all__ = ["EXAMPLE_QUERIES", "WorkbenchSession", "run_workbench"]


def run_workbench(layer) -> None:
    """Launch the best available workbench UI over ``layer``."""
    try:
        from sidemantic_spark.workbench.app import WorkbenchApp
    except ModuleNotFoundError:
        raise ModuleNotFoundError(
            "the full-screen workbench requires the optional 'textual' "
            "dependency; use `sidemantic-spark workbench` for the plain REPL"
        ) from None
    WorkbenchApp(WorkbenchSession(layer)).run()
