"""Error model for the directive chain.

The reference diverts failing rows to an error collector with code+message and
skips the rest of the chain for them (reference:
wrangler-core/.../executor/RecipePipelineExecutor.java:145-158,
wrangler-api/.../ErrorRowException.java). Ray Data operators are single-output,
so we carry errors as a *separate Arrow table* threaded through the fused
chain; at the end of the batch function the error rows are serialized (the
row as a JSON string, since its schema is frozen at the failing directive and
may differ from the final output schema) and concatenated onto the output with
the ok-columns nulled.  ``RecipeResult.ok()`` / ``.errors()`` split them back.
"""

from __future__ import annotations

import json

import pyarrow as pa

# Reserved columns appended to the tagged output.
ERROR_COLUMNS = ("_wr_code", "_wr_msg", "_wr_directive", "_wr_row")

_ERROR_SCHEMA = pa.schema(
    [
        pa.field("_wr_code", pa.int32()),
        pa.field("_wr_msg", pa.string()),
        pa.field("_wr_directive", pa.string()),
        pa.field("_wr_row", pa.string()),
    ]
)


class RecipeParseError(ValueError):
    """Recipe text failed to tokenize/parse/compile."""


class DirectiveError(RuntimeError):
    """A directive failed for the whole batch (configuration-level failure,
    e.g. rename target already exists — reference
    wrangler-core/.../utils/ColumnConverter.java:49-66)."""


class PipelineAbort(RuntimeError):
    """Raised by the ``fail`` directive (reference directives/row/Fail.java:73-110):
    aborts the whole run."""


def _json_default(v):
    return str(v)


def make_error_table(rows: pa.Table, code: int, msg: str, directive_name: str) -> pa.Table:
    """Serialize error rows into the 4-column error schema."""
    n = rows.num_rows
    if n == 0:
        return _ERROR_SCHEMA.empty_table()
    serialized = [
        json.dumps(
            {k: row[k] for k in rows.column_names},
            default=_json_default,
            ensure_ascii=False,
        )
        for row in rows.to_pylist()
    ]
    return pa.table(
        {
            "_wr_code": pa.array([code] * n, pa.int32()),
            "_wr_msg": pa.array([msg] * n, pa.string()),
            "_wr_directive": pa.array([directive_name] * n, pa.string()),
            "_wr_row": pa.array(serialized, pa.string()),
        }
    )


def empty_error_table() -> pa.Table:
    return _ERROR_SCHEMA.empty_table()
