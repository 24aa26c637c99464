"""Large-scale training-data operations (beyond the reference's surface):
deduplication, similarity search, text analysis, multimodal plumbing.
All Dataset → Dataset, shuffle-conscious, vectorized per batch."""

from wrangler_ray.ops import dedup  # noqa: F401
from wrangler_ray.ops import ann_index  # noqa: F401
from wrangler_ray.ops import dedup_index  # noqa: F401
from wrangler_ray.ops import joins  # noqa: F401
from wrangler_ray.ops import profile  # noqa: F401
from wrangler_ray.ops import sampling  # noqa: F401
from wrangler_ray.ops import similarity  # noqa: F401
from wrangler_ray.ops import text  # noqa: F401
from wrangler_ray.ops import multimodal  # noqa: F401
