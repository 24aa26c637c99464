"""Expression-driven directives: set-column, filter-row, send-to-error,
fail, set-variable, increment-variable (reference:
directives/transformation/ColumnExpression.java, row/RecordConditionFilter.java,
row/SendToError.java, row/Fail.java, directives/aggregates/*.java)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from wrangler_ray.core.errors import PipelineAbort, make_error_table
from wrangler_ray.core.registry import Directive, directive
from wrangler_ray.expr.engine import compile_expression


def _mask_from(result, n: int) -> np.ndarray:
    """Coerce an expression result to a boolean mask of length n (null→False)."""
    if isinstance(result, np.ndarray):
        if result.dtype == object:
            return np.fromiter((bool(v) if v is not None else False for v in result), bool, n)
        if len(result) != n:
            return np.full(n, bool(result[0]) if len(result) else False)
        return result.astype(bool)
    return np.full(n, bool(result) if result is not None else False)


def _column_from(result, n: int) -> pa.Array:
    if isinstance(result, np.ndarray):
        if len(result) == n:
            if result.dtype == object:
                return pa.array(result.tolist())
            return pa.array(result)
        result = result.tolist()
    # scalar → broadcast
    return pa.array([result] * n)


@directive("set-column")
class SetColumn(Directive):
    """set-column :col exp:{...} — evaluate expression, write result column
    (reference transformation/ColumnExpression.java:96-116)."""

    usage = "set-column :col exp:{expression}"
    _READ_ATTRS = ("expr",)
    _WRITE_ATTRS = ("column",)

    def __init__(self, call):
        self.column = call.col(0)
        self.expr = compile_expression(call.expression(1))

    def apply(self, table, ctx):
        result = self.expr.evaluate_table(table, ctx.variables)
        arr = _column_from(result, table.num_rows)
        if self.column in table.column_names:
            idx = table.column_names.index(self.column)
            return self.ok(table.set_column(idx, self.column, arr))
        return self.ok(table.append_column(self.column, arr))


@directive("filter-row", "filter-row-if-true")
class FilterRow(Directive):
    """filter-row exp:{...} true|false — condition TRUE ⇒ row is DROPPED
    (reference row/RecordConditionFilter.java:81-117; trailing `false`
    inverts). v1 alias filter-row-if-true keeps the same drop-on-true sense."""
    lineage_kind = "filter"

    usage = "filter-row exp:{condition} [true|false]"

    def __init__(self, call):
        self.expr = compile_expression(call.expression(0))
        flag = call.boolean(1, default=True)
        self.drop_on_true = bool(flag)

    def apply(self, table, ctx):
        result = self.expr.evaluate_table(table, ctx.variables)
        mask = _mask_from(result, table.num_rows)
        keep = ~mask if self.drop_on_true else mask
        return self.ok(table.filter(pa.array(keep)))


@directive("filter-row-if-false")
class FilterRowIfFalse(Directive):
    """v1 alias: condition FALSE ⇒ row dropped (keep on true)."""
    lineage_kind = "filter"

    usage = "filter-row-if-false exp:{condition}"

    def __init__(self, call):
        self.expr = compile_expression(call.expression(0))

    def apply(self, table, ctx):
        result = self.expr.evaluate_table(table, ctx.variables)
        mask = _mask_from(result, table.num_rows)
        return self.ok(table.filter(pa.array(mask)))


@directive("send-to-error")
class SendToError(Directive):
    """send-to-error exp:{...} [metric] ['message'] — condition true ⇒ row
    diverted to the error channel and removed from the main flow (reference
    row/SendToError.java:102-136)."""

    usage = "send-to-error exp:{condition} [metric] ['message']"

    def __init__(self, call):
        self.expr = compile_expression(call.expression(0))
        self.message = None
        self.metric = None
        for i in range(1, call.argc):
            t = call.tokens[i]
            if t.kind == "text":
                self.message = t.value
            elif t.kind == "identifier":
                self.metric = t.value

    def apply(self, table, ctx):
        result = self.expr.evaluate_table(table, ctx.variables)
        mask = _mask_from(result, table.num_rows)
        if not mask.any():
            return self.ok(table)
        bad = table.filter(pa.array(mask))
        ok = table.filter(pa.array(~mask))
        msg = self.message or f"condition '{self.expr.source}' evaluated true"
        if self.metric:
            ctx.variables[self.metric] = ctx.variables.get(self.metric, 0) + bad.num_rows
        return ok, make_error_table(bad, 1, msg, self.name)


@directive("send-to-error-and-continue")
class SendToErrorAndContinue(Directive):
    """send-to-error-and-continue exp:{...} ['message'] — emit matching rows
    to the error channel but KEEP them in the main flow (reference
    row/SendToErrorAndContinue.java; executor continues the chain,
    RecipePipelineExecutor.java:145-151)."""

    usage = "send-to-error-and-continue exp:{condition} ['message']"

    def __init__(self, call):
        self.expr = compile_expression(call.expression(0))
        self.message = None
        for i in range(1, call.argc):
            t = call.tokens[i]
            if t.kind == "text":
                self.message = t.value

    def apply(self, table, ctx):
        result = self.expr.evaluate_table(table, ctx.variables)
        mask = _mask_from(result, table.num_rows)
        if not mask.any():
            return self.ok(table)
        bad = table.filter(pa.array(mask))
        msg = self.message or f"condition '{self.expr.source}' evaluated true"
        return table, make_error_table(bad, 1, msg, self.name)


@directive("fail")
class Fail(Directive):
    """fail exp:{...} — abort the entire run when any row satisfies the
    condition (reference row/Fail.java:73-110)."""

    usage = "fail exp:{condition}"

    def __init__(self, call):
        self.expr = compile_expression(call.expression(0))

    def apply(self, table, ctx):
        result = self.expr.evaluate_table(table, ctx.variables)
        mask = _mask_from(result, table.num_rows)
        if mask.any():
            raise PipelineAbort(
                f"fail: condition '{self.expr.source}' evaluated true for "
                f"{int(mask.sum())} row(s)"
            )
        return self.ok(table)


@directive("set-variable")
class SetVariable(Directive):
    """set-variable name exp:{...} — transient variable (reference
    directives/aggregates/SetTransientVariable.java). GLOBAL scope maps to a
    per-batch partial in ctx.variables; for run-level totals merge partials
    via ds.aggregate (see §2.12 of the survey)."""

    usage = "set-variable <name> exp:{expression}"

    def __init__(self, call):
        self.var = call.text(0)
        self.expr = compile_expression(call.expression(1))

    def apply(self, table, ctx):
        result = self.expr.evaluate_table(table, ctx.variables)
        if isinstance(result, np.ndarray) and len(result):
            ctx.variables[self.var] = result[-1]
        else:
            ctx.variables[self.var] = result
        return self.ok(table)


@directive("increment-variable")
class IncrementVariable(Directive):
    """increment-variable name value exp:{condition} — add `value` for every
    row where condition is true (reference
    directives/aggregates/IncrementTransientVariable.java:81-109). The
    per-batch partial lives in ctx.variables[name]."""

    usage = "increment-variable <name> <value> exp:{condition}"

    def __init__(self, call):
        self.var = call.text(0)
        self.step = call.number(1, default=1) or 1
        self.expr = compile_expression(call.expression(2))

    def apply(self, table, ctx):
        result = self.expr.evaluate_table(table, ctx.variables)
        mask = _mask_from(result, table.num_rows)
        ctx.variables[self.var] = ctx.variables.get(self.var, 0) + float(self.step) * int(
            mask.sum()
        )
        return self.ok(table)
