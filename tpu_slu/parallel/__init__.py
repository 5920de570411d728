"""Multi-chip execution: device meshes, shardings, data-parallel training.

The reference is strictly single-GPU (SURVEY.md §2: no DDP/NCCL anywhere).
The TPU-native design is SPMD over a ``jax.sharding.Mesh``: batches sharded
over the ``data`` axis, params replicated (with the large vocab heads
optionally sharded over ``model``), and XLA/GSPMD inserting the gradient
all-reduce over ICI.
"""

from tpu_slu.parallel.mesh import (
    make_mesh,
    batch_shardings,
    param_shardings,
    make_dp_train_step,
)

__all__ = ["make_mesh", "batch_shardings", "param_shardings", "make_dp_train_step"]
