"""Multi-host branches, unit-tested without a pod (VERDICT r2 missing #3).

The single-process test harness can never execute ``jax.process_count() > 1``
paths for real; these tests inject the process count and the allgather so the
aggregation math and the wrapped-shard weighting are still pinned.
"""

import numpy as np
import pytest

from tpu_slu.data.loader import BatchLoader
from tpu_slu.training.trainer import _all_hosts_sum


class TestAllHostsSum:
    def test_single_process_identity(self):
        vals = [1.0, 2.5]
        assert _all_hosts_sum(vals, process_count=1) is vals

    def test_multi_process_sums_over_hosts(self):
        """The pod branch stacks scalars and sums the allgathered (P, K)
        matrix over hosts — simulate 3 hosts whose gathers differ."""

        def fake_allgather(stacked):
            local = np.asarray(stacked)
            return np.stack([local, 2 * local, 3 * local])  # hosts 0..2

        out = _all_hosts_sum([1.0, 10.0, 0.5], process_count=3, allgather=fake_allgather)
        np.testing.assert_allclose(out, [6.0, 60.0, 3.0])

    def test_shape_mismatch_is_caught(self):
        def bad_allgather(stacked):
            return np.asarray(stacked)  # forgot the host axis

        with pytest.raises(AssertionError):
            _all_hosts_sum([1.0], process_count=2, allgather=bad_allgather)


class DS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return i


def dict_collate(items):
    return {"x": np.asarray(items, np.float32), "w": np.ones(len(items), np.float32)}


class TestWrappedShardWeights:
    def test_duplicates_get_weight_zero(self):
        """10 examples over 4 hosts: ceil -> 3 per host, 2 wrapped duplicates
        globally. Weighted example count must equal the true dataset size, so
        epoch metrics are exact (loader.py shard wrap)."""
        total_weight = 0.0
        seen = []
        for pidx in range(4):
            loader = BatchLoader(
                DS(10), 3, collate=dict_collate, shuffle=True, seed=7,
                process_index=pidx, process_count=4,
            )
            for batch in loader:
                total_weight += float(batch["w"].sum())
                seen.extend(
                    int(i) for i, w in zip(batch["x"], batch["w"]) if w > 0
                )
        assert total_weight == 10.0
        assert sorted(seen) == list(range(10))

    def test_no_sharding_keeps_full_weight(self):
        loader = BatchLoader(DS(10), 4, collate=dict_collate, shuffle=False)
        total = sum(float(b["w"].sum()) for b in loader)
        assert total == 10.0

    def test_even_split_has_no_zero_weights(self):
        for pidx in range(2):
            loader = BatchLoader(
                DS(8), 4, collate=dict_collate, shuffle=False,
                process_index=pidx, process_count=2,
            )
            for batch in loader:
                assert (batch["w"] == 1.0).all()
