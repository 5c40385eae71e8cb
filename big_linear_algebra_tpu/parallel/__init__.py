"""Distribution: mesh construction, DP/TP shardings, collective helpers.

The reference has zero parallelism (SURVEY.md §2.4); this package is the
TPU-native distribution layer all models share: ``Mesh`` over ICI, batch-dim
data parallelism, optional tensor parallelism for the dense GEMMs, and
sequence-sharded ring attention (nn/attention.py builds on these).
No NCCL/MPI/custom transport — XLA collectives only.
"""

from big_linear_algebra_tpu.parallel.mesh import (  # noqa: F401
    default_mesh,
    distributed_init,
    local_device_count,
    make_hybrid_mesh,
    make_mesh,
)
from big_linear_algebra_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    replicate,
    shard_params_tp,
)
from big_linear_algebra_tpu.parallel.pipeline import gpipe  # noqa: F401
from big_linear_algebra_tpu.parallel.ring_attention import (  # noqa: F401
    ring_attention,
)
