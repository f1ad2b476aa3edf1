from adfmsl.parallel.shard_map_step import make_shard_map_train_step
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
    "make_shard_map_train_step", "shard_params_tp", "w2v2_param_specs",
    "batch_sharding", "make_mesh", "pad_batch_to_devices", "replicate",
    "replicated", "shard_batch",
]
