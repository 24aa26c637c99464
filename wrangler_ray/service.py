"""Thin service façade: the reference's interactive workspace surface
(wrangler-service DirectivesHandler.java:359-668) as LIBRARY functions —
upload a bounded sample, execute a recipe on it, get a BasicStatistics-style
summary and an output schema. No HTTP: the contract here is the SEMANTICS
(sampler choice, execute-on-sample with a row limit, null/empty/type
statistics, schema of the wrangled sample), which is what a notebook or a
thin REST wrapper needs.

Scale note: a workspace IS a sample — everything here is driver-resident by
design (the reference caps workspaces the same way, sampling.limit). Full-
corpus runs go through ``apply_recipe`` on the Dataset, never through this
module.
"""

from __future__ import annotations

from typing import Optional, Union

import pyarrow as pa
import pyarrow.compute as pc

from wrangler_ray.pipeline import apply_recipe_table

# in-process workspace registry (reference WorkspaceDataset, minus the
# persistence — a session-scoped dict matches the library-façade scope)
_WORKSPACES: dict[str, "Workspace"] = {}

# value-type detector patterns (reference statistics/BasicStatistics.java
# types ColumnMetric): RE2-safe so the same patterns run in SQL oracles.
# Order matters — first match wins per value.
TYPE_PATTERNS: list[tuple[str, str]] = [
    ("integer", r"^[+-]?\d+$"),
    ("number", r"^[+-]?(\d+\.\d*|\.\d+)([eE][+-]?\d+)?$"),
    ("boolean", r"^(?i)(true|false|yes|no|t|f)$"),
    ("date", r"^\d{4}-\d{2}-\d{2}$"),
    ("datetime", r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?"),
]


def _sample_dataset(ds, sampler: str, limit: int, seed: int):
    from wrangler_ray.ops import sampling

    if sampler == "first":
        return ds.limit(limit)
    if sampler == "bernoulli":
        # oversample fraction then cap — mirrors the reference's
        # sample-then-limit shape for probabilistic samplers
        n = ds.count()
        frac = min(1.0, (limit * 1.25) / max(n, 1))
        return sampling.bernoulli(ds, frac, seed=seed).limit(limit)
    if sampler == "reservoir":
        return sampling.reservoir(ds, limit, seed=seed)
    if sampler == "poisson":
        n = ds.count()
        mean = min(1.0, (limit * 1.25) / max(n, 1))
        return sampling.poisson(ds, mean, seed=seed).limit(limit)
    raise ValueError(
        f"unknown sampler {sampler!r} (first|bernoulli|poisson|reservoir)"
    )


class Workspace:
    """A named, bounded sample plus the directives last executed on it."""

    def __init__(self, name: str, sample: pa.Table, sampler: str, limit: int):
        self.name = name
        self.sample = sample
        self.sampler = sampler
        self.limit = limit
        self.directives: list[str] = []  # last executed recipe (reference
        # updateWorkspaceRequest: the workspace remembers its recipe)

    # -- execute-on-sample (DirectivesHandler.execute:544-586) -------------

    def execute(
        self,
        recipe: Optional[list[str]] = None,
        limit: Optional[int] = None,
        environment: Optional[dict] = None,
    ) -> pa.Table:
        """Run ``recipe`` over (at most ``limit`` rows of) the sample and
        return the wrangled table. Error rows are dropped (the interactive
        surface shows the ok-flow; use apply_recipe(on_error=...) on the
        full dataset for error channels)."""
        t = self.sample
        if limit is not None:
            t = t.slice(0, limit)
        recipe = list(recipe or [])
        if recipe:
            out, _errors = apply_recipe_table(t, recipe, environment=environment)
        else:
            out = t
        self.directives = recipe
        return out

    # -- schema (DirectivesHandler.schema:625-668) --------------------------

    def schema(
        self, recipe: Optional[list[str]] = None, limit: Optional[int] = None
    ) -> list[dict]:
        """Execute, then describe the RESULT schema as a field list
        (name/type/nullable) — the reference returns the record schema's
        fields array, merged across rows; Arrow's table schema IS that
        merged view."""
        out = self.execute(recipe, limit=limit)
        return [
            {
                "name": f.name,
                "type": str(f.type),
                "nullable": bool(out.column(f.name).null_count > 0),
            }
            for f in out.schema
        ]

    # -- summary (DirectivesHandler.summary:595-623 + BasicStatistics) ------

    def summary(
        self, recipe: Optional[list[str]] = None, limit: Optional[int] = None
    ) -> dict:
        """Execute, then compute BasicStatistics-style per-column metrics
        over the wrangled sample: ``stats`` = fraction null / non-null /
        empty, ``types`` = fraction of non-null values matching each
        detector pattern (string columns; non-string columns report their
        Arrow type at 1.0). All fractions are of the ROW COUNT, like the
        reference's ColumnMetric.percentage."""
        out = self.execute(recipe, limit=limit)
        n = out.num_rows
        cols: dict[str, dict] = {}
        for name in out.column_names:
            col = out.column(name)
            null_n = col.null_count
            stats = {
                "null": (null_n / n) if n else 0.0,
                "non-null": ((n - null_n) / n) if n else 0.0,
            }
            types: dict[str, float] = {}
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                s = pc.fill_null(col, "")
                empty = pc.sum(
                    pc.and_(pc.equal(s, ""), pc.is_valid(col)).cast(pa.int64())
                ).as_py() or 0
                if empty:
                    stats["empty"] = empty / n
                remaining = pc.is_valid(col).to_numpy(zero_copy_only=False)
                for tname, pat in TYPE_PATTERNS:
                    m = pc.match_substring_regex(s, pat).to_numpy(
                        zero_copy_only=False
                    )
                    hit = m & remaining
                    if hit.any():
                        types[tname] = float(hit.sum()) / n
                    remaining = remaining & ~m
                if remaining.any():
                    types["text"] = float(remaining.sum()) / n
            else:
                if n - null_n:
                    types[str(col.type)] = (n - null_n) / n
            cols[name] = {"stats": stats, "types": types}
        return {"count": n, "columns": cols}


def workspace_upload(
    name: str,
    data: Union[str, pa.Table, "object"],
    sampler: str = "first",
    limit: int = 1000,
    seed: int = 7,
) -> Workspace:
    """Create (or replace) a workspace from ``data`` — a Ray Dataset, an
    Arrow table, or a path readable by ``wrangler_ray.sources.read_any`` —
    holding at most ``limit`` rows drawn by ``sampler`` (first | bernoulli |
    reservoir; reference upload + sample-spec, DirectivesHandler.java:
    359-451). The sample is materialized driver-side: a workspace is the
    interactive unit, never the full corpus."""
    if isinstance(data, str):
        from wrangler_ray.sources import read_any

        data = read_any(data)
    if isinstance(data, pa.Table):
        import ray.data as rd

        data = rd.from_arrow(data)
    sampled = _sample_dataset(data, sampler, limit, seed)
    if isinstance(sampled, pa.Table):  # reservoir returns a Table directly
        sample = sampled.slice(0, limit)
    else:
        tabs = list(sampled.iter_batches(batch_size=None, batch_format="pyarrow"))
        sample = pa.concat_tables(tabs).slice(0, limit) if tabs else pa.table({})
    ws = Workspace(name, sample, sampler, limit)
    _WORKSPACES[name] = ws
    return ws


def workspace_get(name: str) -> Workspace:
    if name not in _WORKSPACES:
        raise KeyError(f"no workspace {name!r}")
    return _WORKSPACES[name]


def workspace_list() -> list[str]:
    return sorted(_WORKSPACES)


def workspace_delete(name: str) -> bool:
    return _WORKSPACES.pop(name, None) is not None
