"""Pure-functional TPU building-block ops (JAX/XLA/Pallas).

These replace the reference's torch.nn modules (reference ``models.py:26-168``)
and the cuDNN GRU/conv kernels it inherits from PyTorch.
"""

from tpu_slu.ops.sinc import sinc_filters, sinc_conv
from tpu_slu.ops.conv import (
    conv1d,
    conv1d_nhc,
    max_pool1d_ceil,
    max_pool1d_ceil_nhc,
    avg_pool1d_ceil,
    masked_max_pool1d_ceil,
    masked_avg_pool1d_ceil,
    downsample,
    leaky_relu,
)
from tpu_slu.ops.gru import (
    GRUParams,
    gru_init,
    gru_apply,
    gru_apply_masked,
    gru_cell_step,
    resolve_gru_impl,
    reverse_padded,
)

__all__ = [
    "sinc_filters",
    "sinc_conv",
    "conv1d",
    "conv1d_nhc",
    "max_pool1d_ceil",
    "max_pool1d_ceil_nhc",
    "avg_pool1d_ceil",
    "masked_max_pool1d_ceil",
    "masked_avg_pool1d_ceil",
    "downsample",
    "leaky_relu",
    "GRUParams",
    "gru_init",
    "gru_apply",
    "gru_apply_masked",
    "resolve_gru_impl",
    "gru_cell_step",
    "reverse_padded",
]
