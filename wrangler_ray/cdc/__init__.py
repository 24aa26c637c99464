from wrangler_ray.cdc.engine import CdcTable  # noqa: F401
from wrangler_ray.cdc.generate import generate_change_stream  # noqa: F401
from wrangler_ray.cdc.oracle import replay_oracle  # noqa: F401
