from adfmsl.heads.episodic import (
    EpisodeSampler,
    batched_episode_loss,
    episode_loss,
    group_by_class,
    kshot_adapt,
    make_episodic_train_step,
    prototype_scores,
    prototypes_from_support,
    prototypical_logits,
)
from adfmsl.heads.fmsl import FMSLHead, am_softmax_logits, l2_normalize
from adfmsl.heads.losses import (
    compute_loss,
    cross_entropy,
    focal_bce,
    focal_ce,
    masked_mean,
)

__all__ = [
    "EpisodeSampler", "batched_episode_loss", "episode_loss", "group_by_class",
    "kshot_adapt", "make_episodic_train_step", "prototype_scores",
    "prototypes_from_support", "prototypical_logits",
    "FMSLHead", "am_softmax_logits", "l2_normalize",
    "compute_loss", "cross_entropy", "focal_bce", "focal_ce", "masked_mean",
]
