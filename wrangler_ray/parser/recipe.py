"""Recipe parser: recipe text → list of ``DirectiveCall``.

Re-implements the lexeme surface of the reference's ANTLR grammar
(wrangler-core/src/main/antlr4/.../Directives.g4:44-68, 202-313) with a small
hand-rolled tokenizer — no ANTLR runtime:

- ``:col`` column refs; ``:a,:b,:c`` column lists
- ``'text'`` single-quoted strings (with ``\\'`` escape)
- numbers (int/float), ``true``/``false``
- ``exp:{...}`` expressions and ``prop:{k=v, ...}`` property maps (balanced braces)
- bare identifiers/options (``base64``, ``if-matched``)
- ``//`` line comments, ``#pragma`` lines, ``;`` statement terminators

The parser only tokenizes; argument *binding* happens in each directive's
``__init__`` (mirrors ``directive.initialize(MapArguments)`` in
wrangler-core/.../parser/GrammarWalker.java:33-75).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

from wrangler_ray.core.errors import RecipeParseError

# token kinds
COLUMN = "column"
COLUMN_LIST = "column_list"
TEXT = "text"
NUMERIC = "numeric"
BOOL = "bool"
EXPRESSION = "expression"
PROPERTIES = "properties"
IDENTIFIER = "identifier"
RANGES = "ranges"


@dataclass
class Token:
    kind: str
    value: Any

    def __repr__(self) -> str:  # pragma: no cover
        return f"{self.kind}({self.value!r})"


@dataclass
class DirectiveCall:
    name: str
    tokens: list[Token]
    source: str = ""

    # -- positional argument helpers used by directive __init__s -----------
    def _tok(self, i: int) -> Token | None:
        return self.tokens[i] if i < len(self.tokens) else None

    def col(self, i: int, default: str | None = None) -> str | None:
        t = self._tok(i)
        if t is None:
            if default is not None:
                return default
            raise RecipeParseError(f"{self.name}: missing column argument {i}: {self.source}")
        if t.kind == COLUMN:
            return t.value
        if t.kind == COLUMN_LIST and len(t.value) == 1:
            return t.value[0]
        raise RecipeParseError(f"{self.name}: argument {i} is not a column: {self.source}")

    def cols(self, i: int) -> list[str]:
        t = self._tok(i)
        if t is None:
            raise RecipeParseError(f"{self.name}: missing column-list argument {i}")
        if t.kind == COLUMN_LIST:
            return list(t.value)
        if t.kind == COLUMN:
            return [t.value]
        raise RecipeParseError(f"{self.name}: argument {i} is not a column list: {self.source}")

    def text(self, i: int, default: str | None = None) -> str | None:
        t = self._tok(i)
        if t is None:
            return default
        if t.kind in (TEXT, IDENTIFIER):
            return t.value
        if t.kind == NUMERIC:
            return str(t.value)
        raise RecipeParseError(f"{self.name}: argument {i} is not text: {self.source}")

    def number(self, i: int, default: float | None = None) -> float | None:
        t = self._tok(i)
        if t is None:
            return default
        if t.kind == NUMERIC:
            return t.value
        if t.kind in (TEXT, IDENTIFIER):
            try:
                return float(t.value)
            except ValueError:
                pass
        raise RecipeParseError(f"{self.name}: argument {i} is not numeric: {self.source}")

    def boolean(self, i: int, default: bool | None = None) -> bool | None:
        t = self._tok(i)
        if t is None:
            return default
        if t.kind == BOOL:
            return t.value
        if t.kind in (TEXT, IDENTIFIER) and str(t.value).lower() in ("true", "false"):
            return str(t.value).lower() == "true"
        raise RecipeParseError(f"{self.name}: argument {i} is not boolean: {self.source}")

    def expression(self, i: int) -> str:
        t = self._tok(i)
        if t is None or t.kind != EXPRESSION:
            raise RecipeParseError(f"{self.name}: argument {i} is not exp:{{...}}: {self.source}")
        return t.value

    def properties(self, i: int, default: dict | None = None) -> dict:
        t = self._tok(i)
        if t is None:
            return default if default is not None else {}
        if t.kind != PROPERTIES:
            raise RecipeParseError(f"{self.name}: argument {i} is not prop:{{...}}: {self.source}")
        return t.value

    def find_kind(self, kind: str):
        for t in self.tokens:
            if t.kind == kind:
                return t.value
        return None

    @property
    def argc(self) -> int:
        return len(self.tokens)


_WS = re.compile(r"\s+")
_NUMBER = re.compile(r"[+-]?\d+(\.\d+)?([eE][+-]?\d+)?")
# reference grammar's NUMERIC_LIST (Directives.g4) — e.g. fixed-length widths 2,4,4
_NUMLIST = re.compile(r"[+-]?\d+(?:\s*,\s*[+-]?\d+)+(?![\w.:=-])")
# bare URLs (invoke-http <url> ...) — must not lex "://" as a column ref
_URL = re.compile(r"[A-Za-z][A-Za-z0-9+.\-]*://\S+")
_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_\-]*")
_COLNAME = re.compile(r"[A-Za-z0-9_\-.]+")


def _scan_braced(s: str, i: int, what: str) -> tuple[str, int]:
    """s[i] == '{'; return (content, index past closing brace), respecting
    nesting and single-quoted strings."""
    assert s[i] == "{"
    depth = 0
    j = i
    in_str = False
    while j < len(s):
        c = s[j]
        if in_str:
            if c == "\\":
                j += 2
                continue
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return s[i + 1 : j], j + 1
        j += 1
    raise RecipeParseError(f"unbalanced braces in {what}: {s[i:i+60]}")


def _scan_quoted(s: str, i: int) -> tuple[str, int]:
    """s[i] == "'"; returns (unescaped content, index past closing quote)."""
    j = i + 1
    out = []
    while j < len(s):
        c = s[j]
        if c == "\\" and j + 1 < len(s) and s[j + 1] in ("'", "\\"):
            out.append(s[j + 1])
            j += 2
            continue
        if c == "'":
            return "".join(out), j + 1
        out.append(c)
        j += 1
    raise RecipeParseError(f"unterminated string: {s[i:i+60]}")


def _parse_props(content: str) -> dict:
    """Parse ``k=v, k2='v 2'`` property content."""
    props: dict[str, Any] = {}
    i = 0
    n = len(content)
    while i < n:
        while i < n and content[i] in " \t,\n":
            i += 1
        if i >= n:
            break
        m = _IDENT.match(content, i)
        if not m:
            raise RecipeParseError(f"bad property key at: {content[i:i+30]}")
        key = m.group(0)
        i = m.end()
        while i < n and content[i] in " \t":
            i += 1
        if i >= n or content[i] != "=":
            raise RecipeParseError(f"expected '=' after property {key}")
        i += 1
        while i < n and content[i] in " \t":
            i += 1
        if i < n and content[i] == "'":
            val, i = _scan_quoted(content, i)
        else:
            j = i
            while j < n and content[j] not in ",\n":
                j += 1
            raw = content[i:j].strip()
            i = j
            if _NUMBER.fullmatch(raw):
                val = float(raw) if ("." in raw or "e" in raw.lower()) else int(raw)
            elif raw.lower() in ("true", "false"):
                val = raw.lower() == "true"
            else:
                val = raw
        props[key] = val
    return props


def tokenize_statement(stmt: str) -> DirectiveCall:
    """Tokenize one directive statement (terminator already stripped)."""
    s = stmt.strip()
    if not s:
        raise RecipeParseError("empty statement")
    m = _IDENT.match(s)
    if not m:
        raise RecipeParseError(f"statement does not start with a directive name: {s[:60]}")
    name = m.group(0)
    i = m.end()
    tokens: list[Token] = []
    n = len(s)
    while i < n:
        c = s[i]
        if c in " \t":
            i += 1
            continue
        if c == ":":  # column or column list
            cols = []
            while True:
                m = _COLNAME.match(s, i + 1)
                if not m:
                    raise RecipeParseError(f"bad column ref at: {s[i:i+30]}")
                cols.append(m.group(0))
                i = m.end()
                # column list: ",:" or "," followed by optional colon
                j = i
                while j < n and s[j] in " \t":
                    j += 1
                if j < n and s[j] == ",":
                    j += 1
                    while j < n and s[j] in " \t":
                        j += 1
                    if j < n and s[j] == ":":
                        i = j
                        continue
                    if j < n and _COLNAME.match(s, j):
                        # bare names after comma in a list context
                        i = j - 1
                        # treat as column continuation without colon
                        m2 = _COLNAME.match(s, j)
                        cols.append(m2.group(0))
                        i = m2.end()
                        continue
                break
            if len(cols) == 1:
                tokens.append(Token(COLUMN, cols[0]))
            else:
                tokens.append(Token(COLUMN_LIST, cols))
            continue
        if c == "'":
            val, i = _scan_quoted(s, i)
            tokens.append(Token(TEXT, val))
            continue
        if s.startswith("exp:", i) or s.startswith("condition:", i):
            b = s.index("{", i)
            content, i = _scan_braced(s, b, "exp")
            tokens.append(Token(EXPRESSION, content.strip()))
            continue
        if s.startswith("prop:", i):
            b = s.index("{", i)
            content, i = _scan_braced(s, b, "prop")
            tokens.append(Token(PROPERTIES, _parse_props(content)))
            continue
        um = _URL.match(s, i)
        if um:
            tokens.append(Token(TEXT, um.group(0)))
            i = um.end()
            continue
        lm = _NUMLIST.match(s, i)
        if lm:
            tokens.append(Token(TEXT, lm.group(0).replace(" ", "")))
            i = lm.end()
            continue
        nm = _NUMBER.match(s, i)
        if nm and (nm.end() == n or not (s[nm.end()].isalnum() or s[nm.end()] in ":_-")):
            raw = nm.group(0)
            tokens.append(
                Token(NUMERIC, float(raw) if ("." in raw or "e" in raw.lower()) else int(raw))
            )
            i = nm.end()
            continue
        im = _IDENT.match(s, i)
        if im:
            word = im.group(0)
            i = im.end()
            if word.lower() in ("true", "false"):
                tokens.append(Token(BOOL, word.lower() == "true"))
            else:
                tokens.append(Token(IDENTIFIER, word))
            continue
        # ranges / anything else up to whitespace (e.g. 0:10=low,11:20=high or 1-3,5)
        j = i
        while j < n and s[j] not in " \t":
            j += 1
        tokens.append(Token(IDENTIFIER, s[i:j]))
        i = j
    return DirectiveCall(name=name, tokens=tokens, source=stmt.strip())


def parse_recipe(recipe: str | list[str]) -> list[DirectiveCall]:
    """Split recipe text into statements and tokenize each.

    Accepts a list of statements (like the reference's test rig,
    wrangler-core/src/test/java/.../TestingRig.java:79-93) or a single text
    with ``;``/newline-separated statements, ``//`` comments and ``#pragma``
    lines (ignored — no plugin loading needed: all directives are in-process).
    """
    if isinstance(recipe, str):
        lines = recipe
    else:
        lines = "\n".join(recipe)

    statements: list[str] = []
    cur: list[str] = []
    i = 0
    n = len(lines)
    in_str = False
    brace = 0
    while i < n:
        c = lines[i]
        if in_str:
            cur.append(c)
            if c == "\\" and i + 1 < n:
                cur.append(lines[i + 1])
                i += 2
                continue
            if c == "'":
                in_str = False
            i += 1
            continue
        if c == "'":
            in_str = True
            cur.append(c)
            i += 1
            continue
        if c == "{":
            brace += 1
            cur.append(c)
            i += 1
            continue
        if c == "}":
            brace -= 1
            cur.append(c)
            i += 1
            continue
        if c == "/" and i + 1 < n and lines[i + 1] == "/" and brace == 0:
            # '//' is a comment ONLY at a token boundary — 'http://...' (the
            # invoke-http URL argument) must not be truncated
            prev = cur[-1] if cur else ""
            if prev not in (":",):
                while i < n and lines[i] != "\n":
                    i += 1
                continue
        if (c == ";" or c == "\n") and brace == 0:
            stmt = "".join(cur).strip()
            if stmt:
                statements.append(stmt)
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    stmt = "".join(cur).strip()
    if stmt:
        statements.append(stmt)

    calls = []
    for st in statements:
        if st.startswith("#pragma"):
            _handle_pragma(st)
            continue
        calls.append(tokenize_statement(st))
    return calls


def _handle_pragma(stmt: str) -> None:
    """Wire ``#pragma`` statements against the in-process registry (grammar
    Directives.g4:98-104). ``load-directives a, b`` is the UDD loading hook —
    every name must resolve in the ``@directive`` registry (all directives,
    built-in and user-defined, live there; there is no external plugin
    artifact to fetch), and unknown names fail at PARSE time like the
    reference's DirectiveParseException. ``#pragma version`` is accepted and
    ignored."""
    body = stmt[len("#pragma"):].strip().rstrip(";").strip()
    if body.startswith("version"):
        return
    if body.startswith("load-directives"):
        from wrangler_ray.core.registry import registered_directives

        registry = registered_directives()
        names = [n.strip() for n in body[len("load-directives"):].split(",")]
        names = [n for n in names if n]
        if not names:
            raise RecipeParseError("#pragma load-directives: no directive names")
        unknown = [n for n in names if n not in registry]
        if unknown:
            raise RecipeParseError(
                f"#pragma load-directives: unknown directive(s) "
                f"{', '.join(unknown)} — not found in the @directive registry"
            )
        return
    raise RecipeParseError(f"unknown #pragma: {body.split()[0] if body else ''!r}")
