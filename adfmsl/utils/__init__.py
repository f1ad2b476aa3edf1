from adfmsl.utils.registry import Registry
from adfmsl.utils.rng import set_global_seed, key_for_step

__all__ = ["Registry", "set_global_seed", "key_for_step"]
