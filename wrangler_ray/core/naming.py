"""Case-insensitive column resolution.

The reference's ``Row`` looks columns up with a case-insensitive linear scan
(reference: wrangler-api/.../Row.java:161-181, first match wins). We keep the
exact semantics but resolve once per batch against the Arrow schema.
"""

from __future__ import annotations

import pyarrow as pa


def resolve_column(schema_or_table, name: str) -> str | None:
    """Return the actual column name matching ``name`` case-insensitively,
    or None when absent. First match wins (duplicate names representable in
    the reference; Arrow forbids exact dupes but may hold case variants)."""
    names = (
        schema_or_table.column_names
        if isinstance(schema_or_table, pa.Table)
        else schema_or_table.names
    )
    if name in names:  # fast path: exact
        return name
    lower = name.lower()
    for n in names:
        if n.lower() == lower:
            return n
    return None


def has_column(schema_or_table, name: str) -> bool:
    return resolve_column(schema_or_table, name) is not None
