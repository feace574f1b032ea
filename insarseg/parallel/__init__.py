"""Multi-chip execution over a TPU slice: mesh construction, batch/state
sharding, sharded inference. GSPMD-first (SURVEY.md §2.4)."""

from insarseg.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    replicate_arrays,
    batch_sharding,
)
from insarseg.parallel.inference import make_predict_fn  # noqa: F401
