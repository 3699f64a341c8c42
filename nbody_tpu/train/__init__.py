from nbody_tpu.train.trainer import Trainer
from nbody_tpu.train.elastic import (ElasticResult, TrainingFault, all_finite,
                                     elastic_train)
from nbody_tpu.train.optim import PlateauScheduler, make_optimizer
from nbody_tpu.train.rollout import autoregressive_rollout, predict_accelerations

__all__ = [
    "Trainer",
    "ElasticResult",
    "TrainingFault",
    "all_finite",
    "elastic_train",
    "PlateauScheduler",
    "make_optimizer",
    "autoregressive_rollout",
    "predict_accelerations",
]
