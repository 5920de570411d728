"""Quick TPU measurement: length-exact (masked) encoder forward, B=64.

Compares the masked bidirectional GRU path (joint kernel vs two
unidirectional launches is toggled inside gru_apply_masked) against the
unmasked forward. Slope-timed like bench.py. Not part of the bench contract.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import tempfile

import __graft_entry__
from tpu_slu.models import encoder as enc
from tpu_slu.models.slu import Model


def slope(fn, iters=60):
    def run(k):
        t0 = time.time()
        for _ in range(k):
            out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        return time.time() - t0

    run(2)
    t1 = min(run(1) for _ in range(3))
    tk = min(run(iters + 1) for _ in range(2))
    return max((tk - t1) / iters, 1e-6) * 1000


def main():
    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=False)
    model = Model(config)
    earch = model.encoder_arch
    params = model.params["pretrained_model"]
    B, T = 64, 64000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(T // 2, T + 1, B).astype(np.int32))

    fwd = jax.jit(lambda p, x: enc.encoder_features(p, earch, x, gru_impl="pallas"))
    fwd_masked = jax.jit(
        lambda p, x, n: enc.encoder_features(p, earch, x, gru_impl="pallas", lengths=n)
    )
    print("unmasked_ms", round(slope(lambda: fwd(params, x)), 3))
    print("masked_ms", round(slope(lambda: fwd_masked(params, x, lengths)), 3))


if __name__ == "__main__":
    main()
