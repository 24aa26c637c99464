"""Directive registry and base class.

The reference registers 86 directives by reflection over
``io.cdap.directives`` (wrangler-core/.../registry/SystemDirectiveRegistry.java:51-96)
and each implements ``define()/initialize(args)/execute(rows, ctx)``
(wrangler-api/.../Directive.java:54-129). Here a directive is a Python class
registered with the ``@directive("name")`` decorator; it binds its arguments
once on the driver (``__init__``) and transforms whole Arrow tables
(``apply(table, ctx) -> (ok, err)``) inside ``map_batches`` workers.
Instances must be (cloud)picklable — compiled regexes / small lookup dicts
are fine; heavy state belongs in actor-pool stages (see stages/).
"""

from __future__ import annotations

from typing import Callable, Optional

import pyarrow as pa

from wrangler_ray.core.errors import empty_error_table

_REGISTRY: dict[str, type] = {}


class DirectiveContext:
    """Per-batch execution context.

    The reference's ``TransientStore`` has LOCAL (reset per record) and GLOBAL
    (per task/run) scopes (wrangler-api/.../TransientStore.java:27-64). In the
    batch model, LOCAL-scope variables become plain per-row computed arrays
    within one batch-fn invocation; GLOBAL variables become per-batch partials
    in ``variables`` that a final small ``ds.aggregate`` (or the caller)
    merges across batches.
    """

    def __init__(self, environment: Optional[dict] = None):
        self.variables: dict = {}
        # Injected deterministic sources (job-start time, RNG seed) so
        # current-datetime / generate-uuid replay identically in tests.
        self.environment: dict = environment or {}


class Directive:
    """Base class. Subclasses set ``name``/``usage`` and implement ``apply``."""

    name: str = ""
    usage: str = ""

    def apply(self, table: pa.Table, ctx: DirectiveContext) -> tuple[pa.Table, pa.Table]:
        raise NotImplementedError

    # Convenience for the common no-error case.
    @staticmethod
    def ok(table: pa.Table) -> tuple[pa.Table, pa.Table]:
        return table, empty_error_table()

    # -- field-level lineage (reference lineage/LineageOperations.java:38-80:
    # each directive declares which fields it reads and writes; the manifest
    # records the chain's declarations) -----------------------------------

    _READ_ATTRS = ("column", "columns", "src", "source", "c1", "c2", "expr")
    _WRITE_ATTRS = ("dst", "destination", "target")

    # relation kind (reference api/lineage/Mutation relations): "transform"
    # (writes derive from reads), "filter" (row predicate — reads only),
    # "drop"/"keep" (column removal — reads name the affected columns),
    # "generate" (parse-like ALL relation: output columns unknown until data)
    lineage_kind: str = "transform"

    def lineage(self) -> dict:
        """Declared (read, write) column sets + relation kind, derived from
        the conventional argument attribute names directives bind in
        ``__init__``. Directives with unusual shapes can override.
        Expression-bearing directives contribute the expression's referenced
        names as reads."""
        reads: list[str] = []
        writes: list[str] = []

        def _add(lst, v):
            if isinstance(v, str) and v and v not in lst:
                lst.append(v)
            elif isinstance(v, (list, tuple)):
                for x in v:
                    _add(lst, x)

        for a in self._READ_ATTRS:
            v = getattr(self, a, None)
            if a == "expr" and v is not None:
                ns = set(getattr(v, "names", []) or []) | set(
                    getattr(v, "row_names", []) or []
                )
                _add(reads, sorted(n for n in ns if "__" not in n))
            else:
                _add(reads, v)
        for a in self._WRITE_ATTRS:
            _add(writes, getattr(self, a, None))
        if self.lineage_kind in ("filter", "drop", "keep"):
            writes = []  # predicates and column removals write nothing
        elif not writes:
            writes = list(reads)  # in-place transforms write what they read
        return {
            "directive": self.name,
            "kind": self.lineage_kind,
            "reads": reads,
            "writes": writes,
        }


def directive(name: str, *aliases: str) -> Callable[[type], type]:
    def wrap(cls: type) -> type:
        cls.name = name
        _REGISTRY[name] = cls
        for a in aliases:
            _REGISTRY[a] = cls
        return cls

    return wrap


def get_directive_class(name: str) -> type:
    # Directive names are case-insensitive identifiers in the grammar.
    cls = _REGISTRY.get(name) or _REGISTRY.get(name.lower())
    if cls is None:
        from wrangler_ray.core.errors import RecipeParseError

        raise RecipeParseError(f"unknown directive '{name}'")
    return cls


def registered_directives() -> dict[str, type]:
    return dict(_REGISTRY)
