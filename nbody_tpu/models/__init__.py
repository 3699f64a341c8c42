from nbody_tpu.models.gnn import GraphModel
from nbody_tpu.models.contconv import ContinuousConvModel
from nbody_tpu.models.mlp import MLP

__all__ = ["GraphModel", "ContinuousConvModel", "MLP"]
