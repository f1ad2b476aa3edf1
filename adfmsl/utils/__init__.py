from adfmsl.utils.registry import Registry
from adfmsl.utils.metrics_log import MetricsLogger, read_metrics
from adfmsl.utils.profiling import StepTimer, annotate, trace
from adfmsl.utils.rng import set_global_seed, key_for_step

__all__ = ["Registry", "MetricsLogger", "read_metrics", "StepTimer", "annotate", "trace", "set_global_seed", "key_for_step"]
