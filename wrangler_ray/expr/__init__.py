from wrangler_ray.expr.engine import CompiledExpr, compile_expression  # noqa: F401
