"""Textual TUI workbench (optional dependency; ref workbench/app.py).

Layout mirrors the reference: model/dimension/metric tree on the left,
semantic-SQL editor with example-query buttons on top, result table +
compiled-SQL panel below.  All data access goes through
:class:`WorkbenchSession`, so this module is pure presentation.
"""

from __future__ import annotations

from textual.app import App, ComposeResult
from textual.binding import Binding
from textual.containers import Horizontal, Vertical
from textual.widgets import Button, DataTable, Footer, Header, Static, TextArea
from textual.widgets import Tree as TreeWidget

from sidemantic_spark.workbench.examples import EXAMPLE_QUERIES
from sidemantic_spark.workbench.session import WorkbenchSession


class WorkbenchApp(App):
    """sidemantic-spark workbench."""

    TITLE = "sidemantic-spark workbench"
    BINDINGS = [
        Binding("ctrl+r", "run_query", "Run"),
        Binding("ctrl+p", "show_sql", "Compiled SQL"),
        Binding("ctrl+q", "quit", "Quit"),
    ]
    CSS = """
    #sidebar { width: 32; border-right: solid $primary; }
    #editor { height: 12; }
    #status { height: 1; color: $text-muted; }
    """

    def __init__(self, session: WorkbenchSession) -> None:
        super().__init__()
        self.session = session

    def compose(self) -> ComposeResult:
        yield Header()
        with Horizontal(id="main"):
            yield TreeWidget("models", id="sidebar")
            with Vertical(id="query-panel"):
                with Horizontal(id="query-buttons"):
                    for name in EXAMPLE_QUERIES:
                        yield Button(name, id=f"ex-{name.lower().replace(' ', '-')}")
                yield TextArea(
                    EXAMPLE_QUERIES["Timeseries"], id="editor", language="sql"
                )
                yield Static("", id="status")
                yield DataTable(id="results")
        yield Footer()

    def on_mount(self) -> None:
        tree = self.query_one("#sidebar", TreeWidget)
        for model, members in self.session.model_tree().items():
            node = tree.root.add(model)
            dims = node.add("dimensions")
            for d in members["dimensions"]:
                dims.add_leaf(d)
            mets = node.add("metrics")
            for m in members["metrics"]:
                mets.add_leaf(m)
        tree.root.expand()

    def on_button_pressed(self, event: Button.Pressed) -> None:
        for name, sql in EXAMPLE_QUERIES.items():
            if event.button.id == f"ex-{name.lower().replace(' ', '-')}":
                self.query_one("#editor", TextArea).text = sql
                return

    def action_run_query(self) -> None:
        sql = self.query_one("#editor", TextArea).text
        result = self.session.run(sql)
        status = self.query_one("#status", Static)
        table = self.query_one("#results", DataTable)
        table.clear(columns=True)
        if result.error:
            status.update(f"[red]{result.error}[/red]")
            return
        status.update(
            f"{len(result.rows)} rows in {result.elapsed_ms:.0f} ms"
        )
        table.add_columns(*result.columns)
        for row in result.rows:
            table.add_row(*[str(v) for v in row])

    def action_show_sql(self) -> None:
        sql = self.query_one("#editor", TextArea).text
        try:
            compiled = self.session.compile(sql)
        except Exception as exc:
            compiled = f"-- compile error: {exc}"
        self.query_one("#status", Static).update(compiled.splitlines()[0])
        self.notify(compiled, title="Compiled Spark SQL", timeout=10)
