"""Arrow schema reconciliation — the additive schema-evolution primitive.

Replaces the reference's per-directive output-schema generation
(wrangler-core/.../executor/RecipePipelineExecutor.java:112-121 with
``DirectiveOutputSchemaGenerator``): in the new engine every batch carries its
Arrow schema, and whenever two tables with different (additive) schemas must
combine — CDC change segments with a new column, error-channel concat, merge
of old partition data with evolved changes — we unify the schemas and
null-backfill the missing columns.
"""

from __future__ import annotations

import pyarrow as pa


def unified_schema(schemas: list[pa.Schema]) -> pa.Schema:
    """Unify schemas additively: union of fields in first-seen order; a field
    appearing with different types is promoted via pyarrow's unify (permissive)
    or falls back to string."""
    try:
        return pa.unify_schemas(list(schemas), promote_options="permissive")
    except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
        # Fall back: first-seen field wins; incompatible re-typed as string.
        fields: dict[str, pa.Field] = {}
        for s in schemas:
            for f in s:
                if f.name not in fields:
                    fields[f.name] = f
                elif fields[f.name].type != f.type:
                    fields[f.name] = pa.field(f.name, pa.string())
        return pa.schema(list(fields.values()))


def unify_to_schema(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``table`` onto ``schema``: missing columns null-backfilled,
    mismatched types cast, column order normalized to ``schema``."""
    n = table.num_rows
    cols = []
    for f in schema:
        if f.name in table.column_names:
            col = table.column(f.name)
            if col.type != f.type:
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(cols, schema=schema)


def reconcile_tables(tables: list[pa.Table]) -> list[pa.Table]:
    """Bring a list of tables onto one unified schema (null-backfill)."""
    tables = [t for t in tables if t is not None]
    if not tables:
        return []
    schema = unified_schema([t.schema for t in tables])
    return [unify_to_schema(t, schema) for t in tables]


def concat_reconciled(tables: list[pa.Table]) -> pa.Table:
    ts = reconcile_tables(tables)
    if not ts:
        raise ValueError("no tables to concat")
    if len(ts) == 1:
        return ts[0]
    return pa.concat_tables(ts)
