"""Context-manager auto-registration for Python authoring.

Mirrors the reference's registry (``core/registry.py:62``,
``core/model.py:75-81``): inside ``with layer: ...``, constructing a
``Model`` registers it on that layer automatically::

    with SparkSemanticLayer(spark) as layer:
        Model(name="orders", table="orders", ...)

The stack is thread-local-free on purpose: authoring happens on the
driver, single-threaded, exactly like the reference.
"""

from __future__ import annotations

_stack: list = []


def push(layer) -> None:
    _stack.append(layer)


def pop(layer) -> None:
    if _stack and _stack[-1] is layer:
        _stack.pop()


def current():
    return _stack[-1] if _stack else None


def notify_model(model) -> None:
    """Called from ``Model.__post_init__``; registers on the active
    layer if one is open and the model isn't already registered."""
    layer = current()
    if layer is not None and model.name not in layer.graph.models:
        layer.graph.add_model(model)
