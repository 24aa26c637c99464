"""Column operations — metadata-only in Arrow (reference §: wrangler-core
src/main/java/io/cdap/directives/column/*.java). These are the cheapest
directives: pure schema manipulation on the batch table, zero data movement.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from wrangler_ray.core.errors import DirectiveError
from wrangler_ray.core.naming import resolve_column
from wrangler_ray.core.registry import Directive, directive
from wrangler_ray.directives.typeconv import convert_column


@directive("drop")
class Drop(Directive):
    """drop :col[,:col]* — remove columns (reference column/Drop.java).
    Missing columns are ignored (reference removes by name when present)."""
    lineage_kind = "drop"

    usage = "drop :column [,:column]*"

    def __init__(self, call):
        self.columns = call.cols(0)

    def apply(self, table, ctx):
        to_drop = [c for c in (resolve_column(table, c) for c in self.columns) if c]
        return self.ok(table.drop_columns(to_drop) if to_drop else table)


@directive("keep")
class Keep(Directive):
    """keep :col[,:col]* — keep only listed columns (reference column/Keep.java)."""
    lineage_kind = "keep"

    usage = "keep :column [,:column]*"

    def __init__(self, call):
        self.columns = call.cols(0)

    def apply(self, table, ctx):
        want = {c.lower() for c in self.columns}
        keep = [c for c in table.column_names if c.lower() in want]
        return self.ok(table.select(keep))


@directive("rename")
class Rename(Directive):
    """rename :old :new — errors if target exists with a different source
    (reference column/Rename.java + utils/ColumnConverter.java:49-66)."""

    usage = "rename :old :new"
    _READ_ATTRS = ("old",)
    _WRITE_ATTRS = ("new",)

    def __init__(self, call):
        self.old = call.col(0)
        self.new = call.col(1)

    def apply(self, table, ctx):
        src = resolve_column(table, self.old)
        if src is None:
            return self.ok(table)
        tgt = resolve_column(table, self.new)
        if tgt is not None and tgt != src:
            raise DirectiveError(
                f"rename: column '{self.new}' already exists"
            )
        names = [self.new if n == src else n for n in table.column_names]
        return self.ok(table.rename_columns(names))


@directive("set-headers", "set-columns")
class SetHeaders(Directive):
    """set-headers :a,:b,... — positional rename (reference column/SetHeader.java)."""

    usage = "set-headers :a [,:b]*"

    def __init__(self, call):
        self.names = call.cols(0)

    def apply(self, table, ctx):
        cur = list(table.column_names)
        new = list(self.names)[: len(cur)] + cur[len(self.names):]
        return self.ok(table.rename_columns(new))


@directive("swap")
class Swap(Directive):
    """swap :a :b — swap two column names (reference column/Swap.java)."""

    usage = "swap :a :b"

    def __init__(self, call):
        self.a = call.col(0)
        self.b = call.col(1)

    def apply(self, table, ctx):
        a = resolve_column(table, self.a)
        b = resolve_column(table, self.b)
        if a is None or b is None:
            raise DirectiveError(f"swap: column not found ({self.a}, {self.b})")
        names = []
        for n in table.column_names:
            names.append(b if n == a else a if n == b else n)
        return self.ok(table.rename_columns(names))


@directive("copy")
class Copy(Directive):
    """copy :src :dst [force] — duplicate a column (reference column/Copy.java:
    errors if dst exists unless force=true)."""

    usage = "copy :source :destination [force]"

    def __init__(self, call):
        self.src = call.col(0)
        self.dst = call.col(1)
        self.force = call.boolean(2, default=False)

    def apply(self, table, ctx):
        src = resolve_column(table, self.src)
        if src is None:
            raise DirectiveError(f"copy: column '{self.src}' not found")
        dst = resolve_column(table, self.dst)
        if dst is not None:
            if not self.force:
                raise DirectiveError(f"copy: column '{self.dst}' already exists")
            table = table.set_column(
                table.column_names.index(dst), dst, table.column(src)
            )
            return self.ok(table)
        return self.ok(table.append_column(self.dst, table.column(src)))


@directive("merge")
class Merge(Directive):
    """merge :a :b :dst 'sep' — concat two string columns (reference
    column/Merge.java). Vectorized via binary_join_element_wise."""

    usage = "merge :a :b :destination 'separator'"

    def __init__(self, call):
        self.a = call.col(0)
        self.b = call.col(1)
        self.dst = call.col(2)
        self.sep = call.text(3, default="")

    def apply(self, table, ctx):
        a = resolve_column(table, self.a)
        b = resolve_column(table, self.b)
        if a is None or b is None:
            return self.ok(table)
        ca = pc.cast(table.column(a), pa.string())
        cb = pc.cast(table.column(b), pa.string())
        merged = pc.binary_join_element_wise(ca, cb, self.sep)
        return self.ok(table.append_column(self.dst, merged))


@directive("change-column-case")
class ChangeColumnCase(Directive):
    """change-column-case lower|upper (reference column/ChangeColCaseNames.java)."""

    usage = "change-column-case lower|upper"

    def __init__(self, call):
        which = (call.text(0, default="lower") or "lower").lower()
        self.upper = which.startswith("upper")

    def apply(self, table, ctx):
        names = [n.upper() if self.upper else n.lower() for n in table.column_names]
        return self.ok(table.rename_columns(names))


@directive("cleanse-column-names")
class CleanseColumnNames(Directive):
    """cleanse-column-names — lowercase, trim, non-alnum→_ (reference
    column/CleanseColumnNames.java:116)."""

    usage = "cleanse-column-names"

    def __init__(self, call):
        pass

    def apply(self, table, ctx):
        names = [
            re.sub(r"[^a-zA-Z0-9_]", "_", n.strip().lower()) for n in table.column_names
        ]
        return self.ok(table.rename_columns(names))


@directive("columns-replace")
class ColumnsReplace(Directive):
    """columns-replace 's/find/replace/' — sed expression over column names
    (reference column/ColumnsReplace.java)."""

    usage = "columns-replace 's/<find>/<replace>/'"

    def __init__(self, call):
        expr = call.text(0)
        m = re.fullmatch(r"s/((?:[^/\\]|\\.)*)/((?:[^/\\]|\\.)*)/(g?)", expr or "")
        if m is None:
            raise DirectiveError(f"columns-replace: bad sed expression '{expr}'")
        self.pattern = re.compile(m.group(1))
        self.repl = m.group(2).replace("$", "\\")  # sed $1 → \1 backrefs
        self.count = 0 if m.group(3) == "g" else 0  # java replaceAll semantics: all

    def apply(self, table, ctx):
        names = [self.pattern.sub(self.repl, n) for n in table.column_names]
        return self.ok(table.rename_columns(names))


@directive("set-type")
class SetType(Directive):
    """set-type :col type [scale] [rounding] [prop:{precision=..}] — cast a
    column (reference column/SetType.java:69-115; conversion matrix
    utils/ColumnConverter.java:103-396: string→num parse, bytes→num big-endian,
    decimal with scale/precision/rounding)."""

    usage = "set-type :col <type> [scale] [rounding] [prop:{precision=<p>}]"

    def __init__(self, call):
        self.column = call.col(0)
        self.type_name = (call.text(1) or "").lower()
        self.scale = None
        self.rounding = "HALF_EVEN"
        self.precision = None
        # optional scale / rounding / props in any trailing order
        for i in range(2, call.argc):
            t = call.tokens[i]
            if t.kind == "numeric":
                self.scale = int(t.value)
            elif t.kind == "properties":
                self.precision = t.value.get("precision")
            elif t.kind in ("identifier", "text"):
                self.rounding = str(t.value).upper()

    def apply(self, table, ctx):
        col = resolve_column(table, self.column)
        if col is None:
            return self.ok(table)
        arr = convert_column(
            table.column(col),
            self.type_name,
            scale=self.scale,
            precision=self.precision,
            rounding=self.rounding,
        )
        idx = table.column_names.index(col)
        return self.ok(table.set_column(idx, col, arr))


@directive("create-record")
class CreateRecord(Directive):
    """create-record :dst :a[,:b]* — group columns into a struct column
    (reference column/CreateRecord.java)."""

    usage = "create-record :dst :a [,:b]*"

    def __init__(self, call):
        self.dst = call.col(0)
        self.sources = call.cols(1)

    def apply(self, table, ctx):
        cols = [resolve_column(table, c) for c in self.sources]
        cols = [c for c in cols if c]
        if not cols:
            return self.ok(table)
        struct = pa.StructArray.from_arrays(
            [table.column(c).combine_chunks() for c in cols], names=cols
        )
        table = table.drop_columns(cols)
        return self.ok(table.append_column(self.dst, struct))


@directive("flatten-record")
class FlattenRecord(Directive):
    """flatten-record :col[,:col]* — explode struct columns into top-level
    `col_field` columns (reference column/FlattenRecord.java)."""

    usage = "flatten-record :col [,:col]*"

    def __init__(self, call):
        self.columns = call.cols(0)

    def apply(self, table, ctx):
        for c in self.columns:
            col = resolve_column(table, c)
            if col is None or not pa.types.is_struct(table.schema.field(col).type):
                continue
            struct = table.column(col).combine_chunks()
            typ = struct.type
            for i in range(typ.num_fields):
                fname = typ.field(i).name
                table = table.append_column(f"{col}_{fname}", struct.field(i))
            table = table.drop_columns([col])
        return self.ok(table)
