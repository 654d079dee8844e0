"""Type-dispatch registry.

Same contract as the reference's ``CallableContainer``
(``puffbird/callables.py:12-55``): an ordered list of ``(callable, classes)``
pairs; calling the container runs the first ``isinstance`` match, else the
default. The reference dispatches on *cell* types at runtime
(``frame.py:35-47``); the Spark engine dispatches on **column DataTypes**
statically (see ``explode.py``), so this container is used for the places
where per-object dispatch still makes sense: ``aggfunc`` selection in
``to_puffy`` and user extension points.
"""

from __future__ import annotations

from collections.abc import Callable


class CallableContainer:
    """Ordered isinstance-dispatch over a default callable."""

    def __init__(self, default: Callable):
        if not callable(default):
            raise TypeError("default must be callable")
        self._default = default
        self._registry: list[tuple[Callable, tuple[type, ...]]] = []

    def add(self, func: Callable, *classes: type) -> "CallableContainer":
        if not callable(func):
            raise TypeError("func must be callable")
        self._registry.append((func, classes))
        return self

    def __call__(self, obj, *args, **kwargs):
        for func, classes in self._registry:
            if isinstance(obj, classes):
                return func(obj, *args, **kwargs)
        return self._default(obj, *args, **kwargs)

    def __repr__(self) -> str:  # pragma: no cover
        return (f"CallableContainer(default={self._default!r}, "
                f"registered={[c for _, c in self._registry]!r})")
