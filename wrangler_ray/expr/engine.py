"""JEXL-style expression engine, vectorized over Arrow batches.

The reference evaluates JEXL3 expressions per row with row columns as
variables (reference wrangler-core/.../expression/EL.java:82-115; used by
set-column / filter-row / send-to-error / fail / set-variable). Here an
expression is compiled ONCE on the driver:

    JEXL-ish source ──preprocess──► restricted Python source
                    ──ast.parse + whitelist validate──► code object

and evaluated per batch in one of two modes:

- **vectorized**: column variables are numpy arrays; ``&&``/``||``/``!``/
  ternary are rewritten to masked numpy helpers, comparisons/arithmetic
  vectorize natively, and library functions lift scalars to arrays via an
  ``@elementwise`` wrapper.
- **row fallback**: if vectorized evaluation raises (mixed types, null
  arithmetic), each row is evaluated with scalar variables; a row that still
  raises yields null (filters treat null as False; set-column writes null).

Never ``eval`` of raw text: the AST is validated against a node/name
whitelist before compilation.
"""

from __future__ import annotations

import ast
import re

import numpy as np
import pyarrow as pa

from wrangler_ray.core.errors import RecipeParseError
from wrangler_ray.expr import functions as F

# ---------------------------------------------------------------------------
# preprocessing: JEXL surface → Python surface
# ---------------------------------------------------------------------------

_NS_CALL = re.compile(r"\b([A-Za-z_][A-Za-z0-9_]*):([A-Za-z_][A-Za-z0-9_]*)\s*\(")


def _rewrite_ternary(src: str) -> str:
    """Rewrite top-level ``cond ? a : b`` to ``((a) if (cond) else (b))``.
    Handles nesting right-associatively; quote/paren aware."""
    depth = 0
    in_str = None
    q_pos = -1
    i = 0
    while i < len(src):
        c = src[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == in_str:
                in_str = None
        elif c in "'\"":
            in_str = c
        elif c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "?" and depth == 0 and q_pos < 0:
            q_pos = i
        elif c == ":" and depth == 0 and q_pos >= 0:
            cond = src[:q_pos]
            a = src[q_pos + 1 : i]
            b = src[i + 1 :]
            return f"(({_rewrite_ternary(a)}) if ({cond}) else ({_rewrite_ternary(b)}))"
        i += 1
    return src


def preprocess(src: str) -> str:
    s = src.strip()
    # namespace calls: math:floor( → math__floor(
    s = _NS_CALL.sub(r"\1__\2(", s)
    # JEXL literals / operators (token-aware enough for our grammar subset)
    s = re.sub(r"\bnull\b", "None", s)
    s = re.sub(r"\btrue\b", "True", s)
    s = re.sub(r"\bfalse\b", "False", s)
    s = s.replace("&&", " and ").replace("||", " or ")
    # '!' not part of '!=' → ' not '
    s = re.sub(r"!(?!=)", " not ", s)
    # ternary
    if "?" in s:
        s = _rewrite_ternary(s)
    return s


# ---------------------------------------------------------------------------
# AST validation + vectorization rewrites
# ---------------------------------------------------------------------------

_ALLOWED_NODES = (
    ast.Expression, ast.BoolOp, ast.BinOp, ast.UnaryOp, ast.Compare, ast.Call,
    ast.Name, ast.Constant, ast.IfExp, ast.And, ast.Or, ast.Not, ast.USub,
    ast.UAdd, ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod,
    ast.Pow, ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE, ast.In,
    ast.NotIn, ast.Load, ast.List, ast.Tuple, ast.Subscript, ast.Index,
    ast.Slice, ast.keyword, ast.BitAnd, ast.BitOr, ast.BitXor, ast.Invert,
)


class _Vectorize(ast.NodeTransformer):
    """Rewrite and/or/not/ifexp into masked-helper calls so they work on
    numpy arrays."""

    def visit_BoolOp(self, node):
        self.generic_visit(node)
        fn = "__wr_and" if isinstance(node.op, ast.And) else "__wr_or"
        out = node.values[0]
        for v in node.values[1:]:
            out = ast.Call(func=ast.Name(id=fn, ctx=ast.Load()), args=[out, v], keywords=[])
        return out

    def visit_UnaryOp(self, node):
        self.generic_visit(node)
        if isinstance(node.op, ast.Not):
            return ast.Call(
                func=ast.Name(id="__wr_not", ctx=ast.Load()), args=[node.operand], keywords=[]
            )
        return node

    def visit_IfExp(self, node):
        self.generic_visit(node)
        return ast.Call(
            func=ast.Name(id="__wr_where", ctx=ast.Load()),
            args=[node.test, node.body, node.orelse],
            keywords=[],
        )


def _validate(tree: ast.AST, src: str) -> None:
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise RecipeParseError(
                f"expression uses unsupported syntax {type(node).__name__}: {src}"
            )
        if isinstance(node, ast.Call) and not isinstance(node.func, ast.Name):
            raise RecipeParseError(f"only simple function calls allowed: {src}")


def _truthy(v):
    if v is None:
        return False
    if isinstance(v, np.ndarray):
        return v
    return bool(v)


def _as_bool(x):
    """Coerce scalar or array to bool scalar/array with None→False."""
    if isinstance(x, np.ndarray):
        if x.dtype == object:
            return np.fromiter((bool(v) if v is not None else False for v in x), bool, len(x))
        return x.astype(bool)
    return _truthy(x)


def _wr_and(a, b):
    a, b = _as_bool(a), _as_bool(b)
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        return np.logical_and(a, b)
    return a and b


def _wr_or(a, b):
    a, b = _as_bool(a), _as_bool(b)
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        return np.logical_or(a, b)
    return a or b


def _wr_not(a):
    a = _as_bool(a)
    if isinstance(a, np.ndarray):
        return np.logical_not(a)
    return not a


def _wr_where(c, a, b):
    c = _as_bool(c)
    if isinstance(c, np.ndarray):
        return np.where(c, a, b)
    return a if c else b


_HELPERS = {
    "__wr_and": _wr_and,
    "__wr_or": _wr_or,
    "__wr_not": _wr_not,
    "__wr_where": _wr_where,
}


class CompiledExpr:
    def __init__(self, source: str):
        self.source = source
        py = preprocess(source)
        try:
            tree = ast.parse(py, mode="eval")
        except SyntaxError as e:
            raise RecipeParseError(f"cannot parse expression '{source}': {e}") from e
        _validate(tree, source)
        # vectorized variant
        vtree = _Vectorize().visit(ast.parse(py, mode="eval"))
        ast.fix_missing_locations(vtree)
        self._vec_code = compile(vtree, "<expr-vec>", "eval")
        self._row_code = compile(tree, "<expr-row>", "eval")
        # free variable names (columns / transient vars referenced)
        self.names = sorted(
            {
                n.id
                for n in ast.walk(tree)
                if isinstance(n, ast.Name) and not isinstance(n.ctx, ast.Store)
            }
            - set(F.FUNCTIONS)
            - {"True", "False", "None"}
        )

    # -- evaluation ---------------------------------------------------------

    def _globals(self) -> dict:
        g = {"__builtins__": {}}
        g.update(F.FUNCTIONS)
        g.update(_HELPERS)
        return g

    def evaluate_table(self, table: pa.Table, variables: dict | None = None):
        """Evaluate over a batch. Returns a numpy array (len == num_rows) or a
        scalar (to be broadcast by the caller)."""
        n = table.num_rows
        cols: dict[str, np.ndarray] = {}
        lower_map = {c.lower(): c for c in reversed(table.column_names)}
        for name in self.names:
            src = None
            if name in table.column_names:
                src = name
            elif name.lower() in lower_map:
                src = lower_map[name.lower()]
            if src is not None:
                cols[name] = table.column(src).to_numpy(zero_copy_only=False)
            elif variables and name in variables:
                cols[name] = variables[name]
            else:
                cols[name] = None  # absent column → null scalar
        # vectorized attempt
        env = dict(cols)
        try:
            out = eval(self._vec_code, self._globals(), env)  # noqa: S307 (validated AST)
            if isinstance(out, np.ndarray) and len(out) == n:
                return out
            if np.isscalar(out) or out is None or isinstance(out, (str, bytes, bool)):
                return out
            return out
        except Exception:
            pass
        # row fallback
        results = []
        g = self._globals()
        for i in range(n):
            envr = {
                k: (v[i] if isinstance(v, np.ndarray) else v) for k, v in cols.items()
            }
            try:
                results.append(eval(self._row_code, g, envr))  # noqa: S307
            except Exception:
                results.append(None)
        return np.array(results, dtype=object)

    def evaluate_row(self, row: dict):
        env = {name: row.get(name) for name in self.names}
        try:
            return eval(self._row_code, self._globals(), env)  # noqa: S307
        except Exception:
            return None


_CACHE: dict[str, CompiledExpr] = {}


def compile_expression(source: str) -> CompiledExpr:
    """Compile with a driver-side cache (reference EL keeps a 1024-entry
    JEXL cache, EL.java:82-99)."""
    ce = _CACHE.get(source)
    if ce is None:
        ce = CompiledExpr(source)
        if len(_CACHE) < 1024:
            _CACHE[source] = ce
    return ce
