"""Measure the chip's VPU elementwise capability: tanh elements/s and FMA ops/s.

The encoder forward is VPU-bound in the GRU gate chain (docs/KERNELS.md), so
the speed-of-light model in bench.py needs the chip's real transcendental and
plain-elementwise throughput — numbers with no trustworthy public spec (unlike
HBM 819 GB/s and MXU 197 bf16 TFLOP/s). Design: a jitted chain of M dependent
ops over an (R, 128) f32 array. Traffic is 8·N bytes vs M·N compute elements;
with M large the chain is compute-dominated and slope-timing the executable
gives ops/s to within the traffic correction (which we subtract analytically).

Usage: python tools/bench_vpu.py  (runs on the session's default device)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench import V5E_HBM_GBPS, robust_slope


def _chain_fn(op, m):
    def fn(x):
        for _ in range(m):
            x = op(x)
        return jnp.sum(x[:1, :1])  # scalar out: no D2H churn in the queue
    return fn


def measure_rate(op, m: int = 256, rows: int = 32768, iters: int = 40,
                 outer: int = 3):
    """Elements/s through a chain of ``m`` dependent ``op`` applications."""
    n = rows * 128
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (rows, 128), dtype=np.float32)) * 0.1
    fn = jax.jit(_chain_fn(op, m))
    fn(x)  # compile

    def run(k):
        t0 = time.time()
        outs = [fn(x) for _ in range(k)]
        np.asarray(outs[-1])
        return time.time() - t0

    sec_per_iter, fb = robust_slope(run, iters, outer=outer)
    # subtract the HBM read (8 bytes/elem in+out is generous; the scalar
    # output means ~4 bytes/elem read only)
    traffic_s = 4.0 * n / (V5E_HBM_GBPS * 1e9)
    compute_s = max(sec_per_iter - traffic_s, 1e-12)
    return m * n / compute_s, fb


def main():
    dev = jax.devices()[0]
    print("device:", dev.device_kind, flush=True)
    for name, op in [
        ("tanh", jnp.tanh),
        # quadratic map: one FMA per step, NOT collapsible by the algebraic
        # simplifier the way an affine x*a+b chain is
        ("fma", lambda x: x * x + 0.1),
        ("exp", jnp.exp),
    ]:
        for m in (128, 256):
            rate, fb = measure_rate(op, m=m)
            print(f"{name:5s} m={m:4d}: {rate/1e9:8.1f} Gelem/s"
                  + ("  [fallback]" if fb else ""), flush=True)


if __name__ == "__main__":
    main()
