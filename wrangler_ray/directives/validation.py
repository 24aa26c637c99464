"""validate-standard — JSON-schema conformance validation with error-channel
output (reference directives/validation/ValidateStandard.java:61 +
conformers/JsonConformer.java).

The reference ships a manifest of built-in standards (hl7-fhir-r4) and checks
each row's JSON object column against the chosen schema; nonconforming rows
raise ErrorRowException — i.e. divert to the error channel with the list of
conformance issues as the message. Here standards are registered via
``register_standard(name, schema_dict)`` (the analog of the resource
manifest; a packaged demo standard ``contact`` ships built-in), and
validation is a pure-Python JSON-Schema subset evaluator compiled once per
directive instance — stateful setup in __init__, vectorized row loop only
over the (parsed) JSON column.

Supported JSON-Schema keywords: $ref (#/definitions, #/$defs), type, enum,
const, required, properties, additionalProperties, items, minItems/maxItems,
minLength/maxLength, pattern, minimum/maximum (+exclusive), multipleOf,
oneOf/anyOf/allOf/not.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from wrangler_ray.core.errors import DirectiveError, make_error_table
from wrangler_ray.core.naming import resolve_column
from wrangler_ray.core.registry import Directive, directive

_STANDARDS: dict[str, dict] = {}


def register_standard(name: str, schema: dict | str) -> None:
    """Register a JSON-Schema standard for validate-standard (the analog of
    the reference's schemas/manifest.json resource registry)."""
    _STANDARDS[name] = json.loads(schema) if isinstance(schema, str) else schema


# a small built-in standard so the directive is usable out of the box (the
# reference ships hl7-fhir-r4; that 3 MB schema is data we do not copy)
register_standard(
    "contact",
    {
        "type": "object",
        "required": ["name"],
        "properties": {
            "name": {"type": "string", "minLength": 1},
            "email": {"type": "string", "pattern": r"^[^@\s]+@[^@\s]+\.[^@\s]+$"},
            "age": {"type": "integer", "minimum": 0, "maximum": 150},
            "tags": {"type": "array", "items": {"type": "string"}},
        },
    },
)

_TYPES = {
    "string": str,
    "boolean": bool,
    "object": dict,
    "array": list,
    "null": type(None),
}


def _type_ok(v, t: str) -> bool:
    if t == "number":
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if t == "integer":
        return (isinstance(v, int) and not isinstance(v, bool)) or (
            isinstance(v, float) and v.is_integer()
        )
    if t == "boolean":
        return isinstance(v, bool)
    return isinstance(v, _TYPES.get(t, object))


class _Validator:
    """Compiled JSON-Schema subset evaluator."""

    MAX_ISSUES = 8

    def __init__(self, schema: dict):
        self.schema = schema
        self.defs = {}
        for key in ("definitions", "$defs"):
            for name, sub in schema.get(key, {}).items():
                self.defs[f"#/{key}/{name}"] = sub
        self._pattern_cache: dict[str, re.Pattern] = {}

    def _resolve(self, schema):
        while isinstance(schema, dict) and "$ref" in schema:
            ref = schema["$ref"]
            if ref == "#":
                schema = self.schema
            elif ref in self.defs:
                schema = self.defs[ref]
            else:
                raise DirectiveError(f"validate-standard: unresolvable $ref {ref!r}")
        return schema

    def _pat(self, p: str) -> re.Pattern:
        r = self._pattern_cache.get(p)
        if r is None:
            r = self._pattern_cache[p] = re.compile(p)
        return r

    def issues(self, value, schema=None, path="#") -> list[str]:
        out: list[str] = []
        self._check(value, self.schema if schema is None else schema, path, out)
        return out

    def _check(self, v, schema, path, out) -> None:
        if len(out) >= self.MAX_ISSUES or schema is True or schema is None:
            return
        if schema is False:
            out.append(f"{path}: schema forbids any value")
            return
        schema = self._resolve(schema)

        t = schema.get("type")
        if t is not None:
            types = t if isinstance(t, list) else [t]
            if not any(_type_ok(v, x) for x in types):
                out.append(f"{path}: expected type {t}, got {type(v).__name__}")
                return
        if "enum" in schema and v not in schema["enum"]:
            out.append(f"{path}: {v!r} not in enum")
        if "const" in schema and v != schema["const"]:
            out.append(f"{path}: {v!r} != const {schema['const']!r}")

        for comb, mode in (("allOf", "all"), ("anyOf", "any"), ("oneOf", "one")):
            subs = schema.get(comb)
            if not subs:
                continue
            results = []
            for sub in subs:
                sub_issues: list[str] = []
                self._check(v, sub, path, sub_issues)
                results.append(not sub_issues)
            if mode == "all" and not all(results):
                out.append(f"{path}: fails {results.count(False)} schema(s) of allOf")
            elif mode == "any" and not any(results):
                out.append(f"{path}: matches no schema of anyOf")
            elif mode == "one" and results.count(True) != 1:
                out.append(f"{path}: matches {results.count(True)} schemas of oneOf (need 1)")
        if "not" in schema:
            sub_issues = []
            self._check(v, schema["not"], path, sub_issues)
            if not sub_issues:
                out.append(f"{path}: matches forbidden 'not' schema")

        if isinstance(v, str):
            if "minLength" in schema and len(v) < schema["minLength"]:
                out.append(f"{path}: length {len(v)} < minLength {schema['minLength']}")
            if "maxLength" in schema and len(v) > schema["maxLength"]:
                out.append(f"{path}: length {len(v)} > maxLength {schema['maxLength']}")
            if "pattern" in schema and not self._pat(schema["pattern"]).search(v):
                out.append(f"{path}: does not match pattern {schema['pattern']!r}")
        elif isinstance(v, bool):
            pass
        elif isinstance(v, (int, float)):
            if "minimum" in schema and v < schema["minimum"]:
                out.append(f"{path}: {v} < minimum {schema['minimum']}")
            if "maximum" in schema and v > schema["maximum"]:
                out.append(f"{path}: {v} > maximum {schema['maximum']}")
            if "exclusiveMinimum" in schema and v <= schema["exclusiveMinimum"]:
                out.append(f"{path}: {v} <= exclusiveMinimum")
            if "exclusiveMaximum" in schema and v >= schema["exclusiveMaximum"]:
                out.append(f"{path}: {v} >= exclusiveMaximum")
            if "multipleOf" in schema and schema["multipleOf"] and v % schema["multipleOf"]:
                out.append(f"{path}: {v} not a multiple of {schema['multipleOf']}")
        elif isinstance(v, dict):
            for req in schema.get("required", []):
                if req not in v:
                    out.append(f"{path}: required property '{req}' missing")
            props = schema.get("properties", {})
            for k, sub in props.items():
                if k in v:
                    self._check(v[k], sub, f"{path}/{k}", out)
            addl = schema.get("additionalProperties")
            if addl is not None:
                extra = [k for k in v if k not in props]
                if addl is False and extra:
                    out.append(f"{path}: additional properties {extra} not allowed")
                elif isinstance(addl, dict):
                    for k in extra:
                        self._check(v[k], addl, f"{path}/{k}", out)
        elif isinstance(v, list):
            if "minItems" in schema and len(v) < schema["minItems"]:
                out.append(f"{path}: {len(v)} items < minItems {schema['minItems']}")
            if "maxItems" in schema and len(v) > schema["maxItems"]:
                out.append(f"{path}: {len(v)} items > maxItems {schema['maxItems']}")
            items = schema.get("items")
            if isinstance(items, list):
                for i, (iv, isch) in enumerate(zip(v, items)):
                    self._check(iv, isch, f"{path}/{i}", out)
            elif items is not None:
                for i, iv in enumerate(v):
                    self._check(iv, items, f"{path}/{i}", out)


@directive("validate-standard")
class ValidateStandard(Directive):
    """validate-standard :col <standard> — validate each row's JSON value in
    ``col`` against a registered standard schema; nonconforming rows go to
    the error channel with the conformance issues as the message (reference
    validation/ValidateStandard.java:61, ErrorRowException semantics at
    :185-200). Null cells and missing columns pass through, like the
    reference's ``continue`` branches."""

    usage = "validate-standard :col <standard-name>"

    def __init__(self, call):
        self.column = call.col(0)
        spec = call.text(1)
        if not spec:
            raise DirectiveError("validate-standard: no standard specified")
        if spec not in _STANDARDS:
            raise DirectiveError(
                f"validate-standard: unknown standard '{spec}'. Known values "
                f"are {', '.join(sorted(_STANDARDS))}"
            )
        self.spec = spec
        self.validator = _Validator(_STANDARDS[spec])

    def apply(self, table, ctx):
        col = resolve_column(table, self.column)
        if col is None:
            return self.ok(table)
        values = table.column(col).to_pylist()
        msgs: list = [None] * len(values)
        for i, v in enumerate(values):
            if v is None:
                continue
            if isinstance(v, (str, bytes)):
                try:
                    v = json.loads(v)
                except ValueError:
                    msgs[i] = "value is not valid JSON"
                    continue
            if not isinstance(v, (dict, list)):
                raise DirectiveError(
                    f"validate-standard: column '{col}' is not a JSON "
                    f"object (it's {type(v).__name__})"
                )
            issues = self.validator.issues(v)
            if issues:
                msgs[i] = "; ".join(issues)
        bad_mask = pa.array([m is not None for m in msgs])
        if not any(m is not None for m in msgs):
            return self.ok(table)
        ok = table.filter(pa.compute.invert(bad_mask))
        err_tables = []
        bad_msgs = [m for m in msgs if m is not None]
        bad_rows = table.filter(bad_mask)
        # group identical messages so the error table is built vectorized
        by_msg: dict[str, list[int]] = {}
        for i, m in enumerate(bad_msgs):
            by_msg.setdefault(m, []).append(i)
        for m, idxs in by_msg.items():
            err_tables.append(
                make_error_table(bad_rows.take(idxs), 1, m, self.name)
            )
        return ok, pa.concat_tables(err_tables)
