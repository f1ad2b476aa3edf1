from adfmsl.utils.registry import Registry
from adfmsl.utils.metrics_log import MetricsLogger, read_metrics
from adfmsl.utils.rng import set_global_seed, key_for_step

__all__ = ["Registry", "MetricsLogger", "read_metrics", "set_global_seed", "key_for_step"]
