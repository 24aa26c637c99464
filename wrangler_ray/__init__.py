"""wrangler_ray — a Ray-Data-native data-processing / CDC ingest engine.

A from-scratch engine with the data-processing capabilities of CDAP Wrangler
(reference: data-integrations/wrangler, studied read-only), re-expressed as
composable Arrow-batch transforms executed as ``ray.data.Dataset`` pipelines:

- A **directive chain**: recipe text → parsed ``DirectiveSpec`` list → fused
  ``Table -> Table`` transform run in a single ``map_batches`` over zero-copy
  Arrow batches (vs the reference's row-at-a-time JVM interpreter,
  wrangler-core/.../executor/RecipePipelineExecutor.java:125-161).
- A **CDC / incremental-ingest engine** (``wrangler_ray.cdc``): binlog-style
  Parquet change segments → in-flight directive chain → partition-hash shuffle
  with per-batch LWW combining → copy-on-write partition merge → manifest-based
  exactly-once commit.
- **Training-data ops** (``wrangler_ray.ops``): dedup (exact/MinHash-LSH/
  SimHash/Jaccard/embedding), similarity search, text analysis, multimodal
  plumbing.
"""

from wrangler_ray.core.config import DirectiveConfig  # noqa: F401
from wrangler_ray.pipeline import (  # noqa: F401
    apply_recipe,
    compile_recipe,
    recipe_lineage,
)

__version__ = "0.1.0"
