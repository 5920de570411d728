"""Launch-overhead microbench (VERDICT r3 ask #1).

Attributes the residual between the encoder-forward wall (~441 us at B=128)
and the max unit floor (~316 us): how much of it is per-`pallas_call` launch
overhead (kernel dispatch + XLA inter-kernel scheduling gaps), the one cost a
whole-stack single-launch fused chain could remove?

Method: a dependency-ordered chain of K minimal pallas kernels (a VMEM copy
of one (8, 128) f32 tile — no meaningful compute or HBM traffic), jitted for
several K; the slope of device time vs K is the marginal cost of adding one
more kernel launch to a program. Three chain flavors bound the estimate:

* ``tiny``      — (8, 128) copy: pure launch + scheduling floor.
* ``gru1``      — a single-block GRU-shaped kernel (one (128, 128) x
  (128, 384) MXU matmul + the gate chain): launch overhead when the kernel
  does one real block of work (measures overlap/hiding).
* ``grid``      — the tiny kernel with a grid=(25,) sequential walk, i.e.
  the launch pattern of one real recurrence layer at B=128 (tb=16, T=400):
  separates *launch* cost from *grid re-entry* cost.

Everything is measured same-process with the repo's two-point slope method
(CLAUDE.md: chip/relay throughput swings +-40% across minutes, so
cross-process numbers cannot be compared).

Output: one JSON line with per-launch microseconds per flavor and the
implied share of the encoder residual (the flagship eval forward runs 5
joint-bidirectional pallas_calls + the conv front-end ops).
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import robust_slope

jax.config.update(
    "jax_compilation_cache_dir", __file__.rsplit("/", 2)[0] + "/.jax_cache"
)


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def tiny_call(x):
    return pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def grid_call(x, n_blocks: int):
    # same tiny body, but a sequential grid walk over n_blocks time blocks —
    # the launch shape of one fused recurrence layer.
    return pl.pallas_call(
        _copy_kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def _gru1_kernel(x_ref, w_ref, o_ref):
    B, H = x_ref.shape
    g = jnp.dot(x_ref[:].astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    rz = 0.5 + 0.5 * jnp.tanh(0.5 * (g[:, : 2 * H]))
    n = jnp.tanh(g[:, 2 * H :] * rz[:, :H])
    o_ref[:] = n + rz[:, H:] * (x_ref[:] - n)


def gru1_call(x, w):
    return pl.pallas_call(
        _gru1_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, w)


def chain_fn(flavor: str, k: int):
    if flavor == "tiny":
        def fn(x):
            for _ in range(k):
                x = tiny_call(x)
            return x
        args = (jnp.zeros((8, 128), jnp.float32),)
    elif flavor == "grid":
        def fn(x):
            for _ in range(k):
                x = grid_call(x, 25)
            return x
        args = (jnp.zeros((200, 128), jnp.float32),)
    elif flavor == "gru1":
        w = jnp.asarray(np.random.default_rng(0).standard_normal(
            (128, 384), np.float32))
        def fn(x):
            for _ in range(k):
                x = gru1_call(x, w)
            return x
        args = (jnp.zeros((128, 128), jnp.float32),)
    else:
        raise ValueError(flavor)
    return jax.jit(fn), args


def measure(flavor: str, ks=(1, 9, 17), iters=200):
    """Device us per program for each chain length K (slope-measured)."""
    per_k = {}
    for k in ks:
        fn, args = chain_fn(flavor, k)
        np.asarray(fn(*args))  # compile

        def run(q):
            t0 = time.time()
            for _ in range(q):
                out = fn(*args)
            np.asarray(out)
            return time.time() - t0

        run(2)
        dt, fb = robust_slope(run, iters, outer=4)
        per_k[k] = dt * 1e6
    ks_sorted = sorted(per_k)
    k0, k1 = ks_sorted[0], ks_sorted[-1]
    per_launch = (per_k[k1] - per_k[k0]) / (k1 - k0)
    return per_k, per_launch


def main():
    out = {"backend": jax.default_backend()}
    for flavor in ("tiny", "grid", "gru1"):
        per_k, per_launch = measure(flavor)
        out[flavor] = {
            "us_at_k": {str(k): round(v, 2) for k, v in per_k.items()},
            "us_per_launch": round(per_launch, 3),
        }
    # the flagship eval forward: 5 joint bi-GRU pallas_calls (grids of
    # 25..2 blocks at B=128/tb=16) + ~6 XLA conv/pool/transpose kernels
    out["encoder_launches"] = 5
    out["implied_residual_us"] = round(
        5 * out["grid"]["us_per_launch"], 1
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
