"""Multi-chip scaling: device meshes, shardings, partition rules."""

from spegnet_tpu.parallel.mesh import create_mesh, mesh_from_config
from spegnet_tpu.parallel.sharding import (
    batch_sharding,
    param_shardings,
    replicated,
    shard_batch,
)
