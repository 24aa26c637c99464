"""Row operations: filters, exploders, error routing (reference: wrangler-core
src/main/java/io/cdap/directives/row/*.java)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from wrangler_ray.core.errors import make_error_table
from wrangler_ray.core.naming import resolve_column
from wrangler_ray.core.registry import Directive, directive


@directive("filter-by-regex", "filter-row-if-matched", "filter-regex")
class FilterByRegex(Directive):
    """filter-by-regex if-matched|if-not-matched :col 'regex' (reference
    row/RecordRegexFilter.java:66-149). Full-match semantics; a null value in
    the column sends that row to the error channel (:102-106); a missing
    column keeps the row (:127-129)."""
    lineage_kind = "filter"

    usage = "filter-by-regex if-matched|if-not-matched :col 'regex'"

    def __init__(self, call):
        mode = (call.text(0) or "if-matched").lower()
        if mode in ("if-matched", "true"):
            self.drop_on_match = True
        else:
            self.drop_on_match = False
        self.column = call.col(1)
        self.pattern = call.text(2)

    def apply(self, table, ctx):
        col = resolve_column(table, self.column)
        if col is None:
            return self.ok(table)
        s = table.column(col)
        if not (pa.types.is_string(s.type) or pa.types.is_large_string(s.type)):
            s = pc.cast(s, pa.string())
        nulls = pc.is_null(s)
        # Java Matcher.matches() = full match → anchor
        matched = pc.match_substring_regex(s, f"^(?:{self.pattern})$")
        if self.drop_on_match:
            keep = pc.and_kleene(pc.invert(pc.fill_null(matched, False)), pc.invert(nulls))
        else:
            keep = pc.and_kleene(pc.fill_null(matched, False), pc.invert(nulls))
        err = make_error_table(
            table.filter(nulls), 2, f"column '{col}' is null, cannot apply regex", self.name
        )
        return table.filter(keep), err


@directive("filter-empty-or-null", "filter-rows-on")
class FilterEmptyOrNull(Directive):
    """filter-rows-on empty-or-null-columns :c[,:c]* — drop a row only when
    EVERY listed column is null/empty (reference
    row/RecordMissingOrNullFilter.java:69-90; we implement the cleaned intent:
    keep if any listed column is non-null or missing, emit once)."""
    lineage_kind = "filter"

    usage = "filter-rows-on empty-or-null-columns :col [,:col]*"

    def __init__(self, call):
        # accept both spellings: filter-empty-or-null :c / filter-rows-on empty-or-null-columns :c
        if call.tokens and call.tokens[0].kind == "identifier":
            self.columns = call.cols(1)
        else:
            self.columns = call.cols(0)

    def apply(self, table, ctx):
        all_empty = None
        any_present = False
        for c in self.columns:
            col = resolve_column(table, c)
            if col is None:
                continue
            any_present = True
            arr = table.column(col)
            empty = pc.is_null(arr)
            if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
                empty = pc.or_kleene(empty, pc.equal(pc.fill_null(arr, ""), ""))
            all_empty = empty if all_empty is None else pc.and_kleene(all_empty, empty)
        if not any_present:
            return self.ok(table)
        keep = pc.invert(pc.fill_null(all_empty, True))
        return self.ok(table.filter(keep))


@directive("flatten")
class Flatten(Directive):
    """flatten :c[,:c]* — explode list columns positionally in lock-step,
    padding to the max list length per row; non-listed columns repeat their
    scalar value (reference row/Flatten.java:78-163)."""

    usage = "flatten :col [,:col]*"

    def __init__(self, call):
        self.columns = call.cols(0)

    def apply(self, table, ctx):
        cols = [c for c in (resolve_column(table, c) for c in self.columns) if c]
        list_cols = [
            c
            for c in cols
            if pa.types.is_list(table.schema.field(c).type)
            or pa.types.is_large_list(table.schema.field(c).type)
        ]
        if not list_cols:
            return self.ok(table)
        n = table.num_rows
        # per-row max length across the listed columns (scalar counts as 1)
        lens = np.ones(n, dtype=np.int64)
        lists = {}
        for c in list_cols:
            vals = table.column(c).to_pylist()
            lists[c] = vals
            ln = np.fromiter(
                (len(v) if isinstance(v, list) else 1 for v in vals), np.int64, n
            )
            lens = np.maximum(lens, ln)
        total = int(lens.sum())
        # build index mapping for non-list columns (repeat row i lens[i] times)
        rep_idx = np.repeat(np.arange(n), lens)
        out_cols = []
        names = []
        for name in table.column_names:
            if name in lists:
                vals = lists[name]
                flat = []
                for i, v in enumerate(vals):
                    k = int(lens[i])
                    if isinstance(v, list):
                        flat.extend(v[:k] + [None] * (k - len(v)))
                    else:
                        flat.extend([v] + [None] * (k - 1))
                elem_type = table.schema.field(name).type.value_type
                out_cols.append(pa.array(flat, elem_type))
            else:
                out_cols.append(table.column(name).take(pa.array(rep_idx)))
            names.append(name)
        assert all(len(c) == total for c in out_cols)
        return self.ok(pa.table(dict(zip(names, out_cols))))


@directive("split-to-rows")
class SplitToRows(Directive):
    """split-to-rows :col 'regex-sep' — one output row per split part
    (reference row/SplitToRows.java:75)."""

    usage = "split-to-rows :col 'separator'"

    def __init__(self, call):
        self.column = call.col(0)
        self.sep = re.compile(call.text(1))

    def apply(self, table, ctx):
        col = resolve_column(table, self.column)
        if col is None:
            return self.ok(table)
        s = table.column(col)
        if not (pa.types.is_string(s.type) or pa.types.is_large_string(s.type)):
            s = pc.cast(s, pa.string())
        vals = s.to_pylist()
        parts = [self.sep.split(v) if v is not None else [None] for v in vals]
        lens = np.fromiter((len(p) for p in parts), np.int64, len(parts))
        rep_idx = np.repeat(np.arange(len(parts)), lens)
        flat = [x for p in parts for x in p]
        out = {}
        for name in table.column_names:
            if name == col:
                out[name] = pa.array(flat, pa.string())
            else:
                out[name] = table.column(name).take(pa.array(rep_idx))
        return self.ok(pa.table(out))


@directive("set-record-delim")
class SetRecordDelimiter(Directive):
    """set-record-delim :col 'delimiter' [limit] — split one text blob into N
    rows (reference row/SetRecordDelimiter.java:82)."""

    usage = "set-record-delim :col 'delimiter' [limit]"

    def __init__(self, call):
        self.column = call.col(0)
        self.delim = call.text(1)
        self.limit = int(call.number(2, default=0) or 0)

    def apply(self, table, ctx):
        col = resolve_column(table, self.column)
        if col is None:
            return self.ok(table)
        vals = table.column(col).to_pylist()
        parts = []
        for v in vals:
            if v is None:
                parts.append([None])
            else:
                p = str(v).split(self.delim)
                if self.limit:
                    p = p[: self.limit]
                parts.append(p)
        lens = np.fromiter((len(p) for p in parts), np.int64, len(parts))
        rep_idx = np.repeat(np.arange(len(parts)), lens)
        flat = [x for p in parts for x in p]
        out = {}
        for name in table.column_names:
            if name == col:
                out[name] = pa.array(flat, pa.string())
            else:
                out[name] = table.column(name).take(pa.array(rep_idx))
        return self.ok(pa.table(out))
