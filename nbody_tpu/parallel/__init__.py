from nbody_tpu.parallel.bh import (bh2_simulate, bh3_simulate, bh_simulate,
                                   sharded_bh_accelerations,
                                   sharded_bh2_accelerations,
                                   sharded_bh3_accelerations)
from nbody_tpu.parallel.mesh import make_mesh, particle_sharding
from nbody_tpu.parallel.ring import ring_accelerations, ring_simulate
from nbody_tpu.parallel.surrogate import (
    sharded_contconv_loss_and_grad,
    sharded_contconv_predict,
    sharded_contconv_rollout,
    sharded_loss_and_grad,
    sharded_predict,
    sharded_rollout,
)

__all__ = [
    "bh2_simulate",
    "bh3_simulate",
    "bh_simulate",
    "make_mesh",
    "particle_sharding",
    "ring_accelerations",
    "ring_simulate",
    "sharded_bh_accelerations",
    "sharded_bh2_accelerations",
    "sharded_bh3_accelerations",
    "sharded_contconv_loss_and_grad",
    "sharded_contconv_predict",
    "sharded_contconv_rollout",
    "sharded_loss_and_grad",
    "sharded_predict",
    "sharded_rollout",
]
