from wrangler_ray.core.errors import (  # noqa: F401
    DirectiveError,
    RecipeParseError,
    ERROR_COLUMNS,
    make_error_table,
)
from wrangler_ray.core.naming import resolve_column, has_column  # noqa: F401
from wrangler_ray.core.registry import (  # noqa: F401
    Directive,
    DirectiveContext,
    directive,
    get_directive_class,
    registered_directives,
)
from wrangler_ray.core.schema import reconcile_tables, unify_to_schema  # noqa: F401
