from wrangler_ray.parser.recipe import (  # noqa: F401
    DirectiveCall,
    Token,
    parse_recipe,
    tokenize_statement,
)
