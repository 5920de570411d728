"""Fused Pallas GRU cell (TPU): hidden state resident in VMEM across time.

The scan-based GRU in ``ops/gru.py`` round-trips the (B, H) hidden state and
the (B, 3H) gate block through HBM every step. This kernel keeps h and W_hh in
VMEM for the whole sequence and streams the precomputed input gates block by
block over the time grid, which is the memory-bandwidth-optimal shape for the
reference's hot loop A (SURVEY.md §3: 4-5 stacked bi-GRUs dominate runtime).

Implemented in a later milestone of this round; until then
``gru_pallas_available()`` reports False and callers fall back to the scan.
"""

from __future__ import annotations


def gru_pallas_available() -> bool:
    return False


def gru_apply_pallas(params, x):  # pragma: no cover - placeholder
    raise NotImplementedError("Pallas GRU kernel not built yet; use impl='scan'")
