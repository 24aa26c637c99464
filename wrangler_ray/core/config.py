"""DirectiveConfig — admin-supplied exclusion (restriction) and aliasing of
directive names, applied at recipe-compile time.

Reference: wrangler-api/.../DirectiveConfig.java:48-120 (the
``{"exclusions": [...], "aliases": {alias: root}}`` JSON shape),
wrangler-core/.../parser/ConfigDirectiveContext.java:27-64 (the context
wrapper) and parser/GrammarWalker.java:77-95 (application order: dereference
the alias first, then refuse BOTH an excluded alias name and an excluded
root). wrangler-docs/exclusion-and-aliasing.md describes the feature.
"""

from __future__ import annotations

import json

from wrangler_ray.core.errors import RecipeParseError


class DirectiveConfig:
    """Exclusions + aliases for directive names.

    ``resolve(name)`` implements GrammarWalker.walk's checks: an alias is
    dereferenced to its root; using an excluded alias name or an excluded
    root raises ``RecipeParseError``; unknown names pass through untouched
    (they fail later in registry lookup, exactly like the reference where an
    unaliased unknown name dies in the registry)."""

    def __init__(self, exclusions=None, aliases=None):
        self.exclusions = set(exclusions or ())
        self.aliases = dict(aliases or {})

    @classmethod
    def from_json(cls, text: str | bytes | dict) -> "DirectiveConfig":
        obj = json.loads(text) if not isinstance(text, dict) else text
        if not isinstance(obj, dict):
            raise RecipeParseError("DirectiveConfig: expected a JSON object")
        return cls(obj.get("exclusions") or [], obj.get("aliases") or {})

    # -- ConfigDirectiveContext surface ------------------------------------
    def has_alias(self, name: str) -> bool:
        return name in self.aliases

    def get_alias(self, name: str) -> str | None:
        return self.aliases.get(name)

    def is_excluded(self, name: str) -> bool:
        return name in self.exclusions

    def reverse_alias(self) -> dict:
        """root → [alias names] (DirectiveConfig.getReverseAlias)."""
        rev: dict[str, list] = {}
        for a, root in self.aliases.items():
            rev.setdefault(root, []).append(a)
        return rev

    # -- application (GrammarWalker.walk:77-95) ----------------------------
    def resolve(self, name: str) -> str:
        root = self.get_alias(name) if self.has_alias(name) else name
        if root != name and self.is_excluded(name):
            raise RecipeParseError(
                f"Aliased directive '{name}' has been configured as a "
                "restricted directive and is hence unavailable. Please "
                "contact your administrator"
            )
        if self.is_excluded(root):
            raise RecipeParseError(
                f"Directive '{name}' has been configured as a restricted "
                "directive and is hence unavailable. Please contact your "
                "administrator"
            )
        return root


EMPTY_CONFIG = DirectiveConfig()
