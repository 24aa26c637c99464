"""Regenerate DIRECTIVES.md from the directive registry."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import wrangler_ray.directives  # noqa: F401  (registers everything)
from wrangler_ray.core.registry import get_directive_class, registered_directives

HEADER = [
    "# Directive cheat sheet",
    "",
    "All directives registered in `wrangler_ray.directives` (generated from the",
    "registry — regenerate with `python scripts/gen_directives_md.py`). Each is a",
    "vectorized `pa.Table -> (ok, err)` transform applied inside one fused",
    "`map_batches` stage; reference file citations are in each class docstring.",
    "",
    "Custom directives: subclass `Directive`, decorate with",
    '`@directive("my-name")`, and the recipe parser picks it up — the analog of',
    "the reference's UDD plugin surface (wrangler-api Directive.java:54-117).",
    "",
    "| Directive | Usage | Summary |",
    "|---|---|---|",
]


def main() -> None:
    lines = list(HEADER)
    for name in sorted(registered_directives()):
        cls = get_directive_class(name)
        usage = getattr(cls, "usage", "").replace("|", "\\|")
        doc = (cls.__doc__ or "").strip().splitlines()[0] if cls.__doc__ else ""
        lines.append(f"| `{name}` | `{usage}` | {doc.replace('|', chr(92) + '|')} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "DIRECTIVES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(lines)} lines")


if __name__ == "__main__":
    main()
