"""Directive library. Importing this package registers every directive."""

from wrangler_ray.directives import column  # noqa: F401
from wrangler_ray.directives import transform  # noqa: F401
from wrangler_ray.directives import row  # noqa: F401
from wrangler_ray.directives import parsers  # noqa: F401
from wrangler_ray.directives import dates  # noqa: F401
from wrangler_ray.directives import expressions  # noqa: F401
from wrangler_ray.directives import lookup  # noqa: F401
from wrangler_ray.directives import writers  # noqa: F401
from wrangler_ray.directives import validation  # noqa: F401
