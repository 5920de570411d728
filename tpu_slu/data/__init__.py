"""Host-side data pipeline: audio decode, dataset construction, batching.

TPU-first replacement for the reference's torch ``DataLoader`` +
libsndfile/sox stack (reference ``data.py``): WAV decode via our own
NumPy/C++ reader, length-bucketed *static-shape* padded batches (so XLA
compiles once per bucket instead of once per max-length), and a threaded
prefetcher feeding device transfers.
"""

from tpu_slu.data.audio import read_wav
from tpu_slu.data.datasets import get_SLU_datasets, get_ASR_datasets, SLUDataset, ASRDataset

__all__ = [
    "read_wav",
    "get_SLU_datasets",
    "get_ASR_datasets",
    "SLUDataset",
    "ASRDataset",
]
