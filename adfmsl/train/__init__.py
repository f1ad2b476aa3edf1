from adfmsl.train.checkpoint import CheckpointManager
from adfmsl.train.early_stop import EarlyStopper
from adfmsl.train.fewshot import FewshotConfig, FewshotTrainer
from adfmsl.train.loop import EpochMetrics, Trainer, make_dataset_and_loader
from adfmsl.train.optim import PlateauTracker, make_optimizer, make_schedule
from adfmsl.train.state import TrainState
from adfmsl.train.steps import make_eval_step, make_train_step

__all__ = [
    "CheckpointManager", "EarlyStopper", "FewshotConfig", "FewshotTrainer", "EpochMetrics", "Trainer",
    "make_dataset_and_loader", "PlateauTracker", "make_optimizer", "make_schedule",
    "TrainState", "make_eval_step", "make_train_step",
]
