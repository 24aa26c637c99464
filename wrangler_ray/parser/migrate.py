"""v1-recipe migration — rewrite legacy (pre-v2) directive syntax into the
v2 grammar the parser accepts.

Reference: wrangler-core/.../parser/MigrateToV2.java:67-90 (line handling:
blank/comment skip, exp:/prop: passthrough, #pragma passthrough) and the
per-directive rewrite table at MigrateToV2.java:100-770. The conversions:
column names gain ``:``, free text becomes quoted, conditions/expressions
become ``exp:{...}``, statements gain ``;``.

One deliberate divergence: the reference's unguarded ``String.format`` calls
render ABSENT optional arguments as the literal string ``"null"`` (e.g.
``set-type col int`` → ``set-type :col int null null null;``); the intent is
visible in the guarded cases (copy, parse-as-csv), so absent optionals are
OMITTED here.
"""

from __future__ import annotations

import re

from wrangler_ray.core.errors import RecipeParseError

# argument kinds: how one v1 whitespace token (or the line remainder) maps
# into the v2 statement
C = "col"          # prefix ':'
CL = "collist"     # comma-separated list → :a,:b
Q = "quote"        # quote unless already quoted
R = "raw"          # unchanged
# REST_* kinds consume the remainder of the line (v1 used a '\n'-delimited
# StringTokenizer for trailing free text / expressions)
REST_E = "rest_exp"      # exp:{...}
REST_Q = "rest_quote"
REST_R = "rest_raw"
REST_C = "rest_col"
REST_CL = "rest_collist"
OPT = "?"          # suffix marking the argument optional


def _col(v: str) -> str:
    return v if v.startswith(":") else ":" + v


def _collist(v: str) -> str:
    # Java String.split drops trailing empty strings — "a,b," → [a, b]
    return ",".join(_col(p.strip()) for p in v.split(",") if p.strip())


def _quote(v: str) -> str:
    if (v.startswith("'") and v.endswith("'")) or (
        v.startswith('"') and v.endswith('"')
    ):
        return v
    if "'" in v:
        return f'"{v}"'
    return f"'{v}'"


# directive → (v2 name, [argument kinds]). Literal tokens to splice into the
# output are written as ("=", text). Order follows MigrateToV2.java:100-770.
_TABLE: dict = {
    "rename": ("rename", [C, C]),
    "set-type": ("set-type", [C, R, R + OPT, R + OPT, R + OPT]),
    "drop": ("drop", [CL]),
    "merge": ("merge", [C, C, C, REST_Q]),
    "uppercase": ("uppercase", [C]),
    "lowercase": ("lowercase", [C]),
    "titlecase": ("titlecase", [C]),
    "indexsplit": ("indexsplit", [C, R, R, C]),
    "split": ("split", [C, Q, C, C]),
    "filter-row-if-matched": ("filter-by-regex", [("=", "if-matched"), C, REST_Q]),
    "filter-row-if-not-matched": (
        "filter-by-regex", [("=", "if-not-matched"), C, REST_Q]),
    "filter-row-if-true": ("filter-row", [REST_E, ("=", "true")]),
    "filter-row-if-false": ("filter-row", [REST_E, ("=", "false")]),
    "set-variable": ("set-variable", [R, REST_E]),
    "increment-variable": ("increment-variable", [R, R, REST_E]),
    "mask-number": ("mask-number", [C, Q]),
    "mask-shuffle": ("mask-shuffle", [C]),
    "format-date": ("format-date", [C, REST_Q]),
    "format-unix-timestamp": ("format-unix-timestamp", [C, REST_Q]),
    "quantize": ("quantize", [C, C, REST_R]),
    "find-and-replace": ("find-and-replace", [CL, REST_Q]),
    "parse-as-csv": ("parse-as-csv", [C, Q, REST_R + OPT]),
    "parse-as-json": ("parse-as-json", [C, REST_R + OPT]),
    "parse-as-avro": ("parse-as-avro", [C, R, R, REST_R + OPT]),
    "parse-as-protobuf": ("parse-as-protobuf", [C, R, Q, REST_R + OPT]),
    "json-path": ("json-path", [C, C, REST_Q]),
    "set-charset": ("set-charset", [C, REST_R + OPT]),
    "invoke-http": ("invoke-http", [Q, CL, REST_Q + OPT]),
    "set-record-delim": ("set-record-delim", [C, Q, REST_R + OPT]),
    "parse-as-fixed-length": ("parse-as-fixed-length", [C, R, REST_Q + OPT]),
    "split-to-rows": ("split-to-rows", [C, REST_Q]),
    "split-to-columns": ("split-to-columns", [C, REST_Q]),
    "parse-xml-to-json": ("parse-xml-to-json", [C, REST_R + OPT]),
    "parse-as-xml": ("parse-as-xml", [C]),
    "xpath": ("xpath", [C, C, REST_Q]),
    "xpath-array": ("xpath-array", [C, C, REST_Q]),
    "flatten": ("flatten", [CL]),
    "copy": ("copy", [C, C, R + OPT]),
    "fill-null-or-empty": ("fill-null-or-empty", [C, REST_Q]),
    "cut-character": ("cut-character", [C, C, Q]),
    "generate-uuid": ("generate-uuid", [C]),
    "url-encode": ("url-encode", [C]),
    "url-decode": ("url-decode", [C]),
    "parse-as-log": ("parse-as-log", [C, REST_Q]),
    "parse-as-date": ("parse-as-date", [C, REST_Q + OPT]),
    "parse-as-simple-date": ("parse-as-simple-date", [C, REST_Q]),
    "diff-date": ("diff-date", [C, C, REST_C]),
    "keep": ("keep", [CL]),
    "parse-as-hl7": ("parse-as-hl7", [C, REST_R + OPT]),
    "split-email": ("split-email", [C]),
    "swap": ("swap", [C, C]),
    "hash": ("hash", [C, Q, REST_R + OPT]),
    "write-as-json-map": ("write-as-json-map", [C]),
    "write-as-json-object": ("write-as-json-object", [C, REST_CL]),
    "write-as-csv": ("write-as-csv", [C]),
    "parse-as-avro-file": ("parse-as-avro-file", [C]),
    "send-to-error": ("send-to-error", [REST_E]),
    "fail": ("fail", [REST_E]),
    "text-distance": ("text-distance", [Q, C, C, C]),
    "text-metric": ("text-metric", [Q, C, C, C]),
    "catalog-lookup": ("catalog-lookup", [Q, C]),
    "table-lookup": ("table-lookup", [C, Q]),
    "stemming": ("stemming", [C]),
    "columns-replace": ("columns-replace", [Q]),
    "extract-regex-groups": ("extract-regex-groups", [C, Q]),
    "split-url": ("split-url", [C]),
    "cleanse-column-names": ("cleanse-column-names", []),
    "change-column-case": ("change-column-case", [R]),
    "set-column": ("set-column", [C, REST_E]),
    "encode": ("encode", [Q, C]),
    "decode": ("decode", [Q, C]),
    "trim": ("trim", [C]),
    "ltrim": ("ltrim", [C]),
    "rtrim": ("rtrim", [C]),
}

_KIND_FN = {
    C: _col,
    CL: _collist,
    Q: _quote,
    R: lambda v: v,
    REST_E: lambda v: f"exp:{{{v}}}",
    REST_Q: _quote,
    REST_R: lambda v: v,
    REST_C: _col,
    REST_CL: _collist,
}


def _rewrite(command: str, rest: str, lineno: int) -> str:
    name, kinds = _TABLE[command]
    parts = [name]
    toks = rest.split()
    ti = 0
    for kind in kinds:
        if isinstance(kind, tuple):  # spliced literal
            parts.append(kind[1])
            continue
        optional = kind.endswith(OPT)
        base = kind.rstrip(OPT)
        if base.startswith("rest_"):
            # remainder of the line from the current token position
            val = " ".join(toks[ti:]).strip()
            ti = len(toks)
        else:
            val = toks[ti].strip() if ti < len(toks) else ""
            ti += 1
        if not val:
            if optional:
                continue
            raise RecipeParseError(
                f"migrate: directive '{command}' missing argument at line "
                f"{lineno} (MigrateToV2 requires it)"
            )
        parts.append(_KIND_FN[base](val))
    return " ".join(parts) + ";"


def migrate_to_v2(recipe) -> str:
    """Translate a v1 recipe (string or list of lines) into v2 grammar text
    (MigrateToV2.migrate). Lines already v2 (containing ``exp:``/``prop:``),
    ``#pragma`` lines, and unknown directives pass through unchanged (with a
    terminating ``;`` added)."""
    lines = recipe.strip().split("\n") if isinstance(recipe, str) else list(recipe)
    out = []
    for lineno, line in enumerate(lines, start=1):
        line = line.strip()
        if not line or line.startswith("//") or (
            line.startswith("#") and not line.startswith("#pragma")
        ):
            continue
        if "exp:" in line or "prop:" in line:
            out.append(line if line.endswith(";") else line + ";")
            continue
        if line.startswith("#pragma"):
            out.append(line)
            continue
        if line.endswith(";"):
            line = line[:-1]
        m = re.match(r"\S+", line)
        command = m.group(0) if m else ""
        rest = line[len(command):].strip()
        if command == "set":
            sub, _, tail = rest.partition(" ")
            if sub == "column":
                colname, _, expr = tail.strip().partition(" ")
                out.append(f"set-column {_col(colname)} exp:{{{expr.strip()}}};")
                continue
            if sub == "columns":
                out.append(f"set-headers {_collist(tail.strip())};")
                continue
        if command == "filter-rows-on":
            sub, _, tail = rest.partition(" ")
            tail = tail.strip()
            subl = sub.lower()
            if subl == "condition-false":
                out.append(f"filter-row exp:{{{tail}}} false;")
            elif subl == "condition-true":
                out.append(f"filter-row exp:{{{tail}}} true;")
            elif subl == "empty-or-null-columns":
                out.append(f"filter-empty-or-null {_collist(tail)};")
            elif subl == "regex-match":
                colname, _, pattern = tail.partition(" ")
                out.append(
                    f"filter-by-regex if-matched {_col(colname)} "
                    f"{_quote(pattern.strip())};"
                )
            elif subl == "regex-not-match":
                colname, _, pattern = tail.partition(" ")
                out.append(
                    f"filter-by-regex if-not-matched {_col(colname)} "
                    f"{_quote(pattern.strip())};"
                )
            else:
                raise RecipeParseError(
                    f"filter-rows-on: unknown option '{sub}' at line {lineno}"
                )
            continue
        if command in _TABLE:
            out.append(_rewrite(command, rest, lineno))
        else:
            out.append(line + ";")
    return "\n".join(out)
