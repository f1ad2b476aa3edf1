from adfmsl.parallel.tp import shard_params_tp, w2v2_param_specs
from adfmsl.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_batch_to_devices,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "shard_params_tp", "w2v2_param_specs",
    "batch_sharding", "make_mesh", "pad_batch_to_devices", "replicate",
    "replicated", "shard_batch",
]
