"""Attribute the encoder-forward residual: dispatch overhead vs device work.

tools/bench_launch.py measured that a chain of K tiny pallas kernels costs
the SAME per program execution for K = 1, 9, 17 (~125-170 us, slope ~0):
per-kernel launch overhead inside a program is nil, but every queued program
EXECUTION carries a large fixed cost. This tool pins down what that means
for the flagship encoder forward (the bench contract metric):

* ``noop``      — a jitted (8,128) x+1, no pallas: the floor any program
  execution pays through this runtime, kernels or not.
* ``tiny``      — the same, as one tiny pallas kernel: pallas delta, if any.
* ``fwd``       — the flagship encoder forward at B=128, output reduced to
  a scalar (full outputs churn MBs through the sync and collapse the slope).
* ``fwd_scan8`` — 8 forward iterations inside ONE program via ``lax.scan``
  (distinct inputs, summed outputs), reported per iteration: if the fixed
  cost is per-program dispatch, scanning amortizes it 8x and the per-iter
  time collapses toward the true device compute (the HBM floor).

All flavors are measured same-process with interleaved rounds (the
chip/relay throughput swings +-40% across minutes, CLAUDE.md), using the
repo's two-point slope.

Output: one JSON line; see docs/KERNELS.md "Where the residual lives".
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from bench import robust_slope

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)


def build_variants(B=128, seconds=4.0, scan_k=8):
    import __graft_entry__
    from tpu_slu.models import encoder as enc
    from tpu_slu.models.slu import Model
    from tpu_slu.ops.pallas_gru import gru_pallas_available

    gru_impl = "pallas" if gru_pallas_available() else "scan"
    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=False)
    model = Model(config)
    earch = model.encoder_arch
    params = model.params["pretrained_model"]
    T = int(seconds * 16000)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T), np.float32))
    xs = jnp.asarray(
        np.random.default_rng(1).standard_normal((scan_k, B, T), np.float32)
    )

    def _copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    tiny_x = jnp.zeros((8, 128), jnp.float32)
    noop = jax.jit(lambda t: jnp.sum(t + 1.0))
    tiny = jax.jit(
        lambda t: jnp.sum(
            pl.pallas_call(
                _copy_kernel, out_shape=jax.ShapeDtypeStruct(t.shape, t.dtype)
            )(t)
        )
    )
    fwd = jax.jit(
        lambda p, x: jnp.sum(enc.encoder_features(p, earch, x, gru_impl=gru_impl))
    )

    def scan_body(acc, xi):
        return acc + jnp.sum(enc.encoder_features(params, earch, xi,
                                                  gru_impl=gru_impl)), None

    fwd_scan = jax.jit(lambda xs: lax.scan(scan_body, jnp.float32(0.0), xs)[0])

    # Same scan, but inputs GENERATED on device per iteration (x * (1 + i/k))
    # instead of sliced from a stacked HBM buffer — isolates whether
    # fwd_scan's extra time is the per-iteration dynamic-slice
    # materialization or the scan body itself.
    def _scan_gen(p, xx):
        def body(acc, i):
            xi = xx * (1.0 + i.astype(jnp.float32) / scan_k)
            return acc + jnp.sum(enc.encoder_features(p, earch, xi,
                                                      gru_impl=gru_impl)), None

        return lax.scan(body, jnp.float32(0.0), jnp.arange(scan_k))[0]

    fwd_scan_gen = jax.jit(_scan_gen)

    return {
        "noop": (lambda: noop(tiny_x), 1),
        "tiny": (lambda: tiny(tiny_x), 1),
        "fwd": (lambda: fwd(params, x), 1),
        f"fwd_scan{scan_k}": (lambda: fwd_scan(xs), scan_k),
        f"fwd_scangen{scan_k}": (lambda: fwd_scan_gen(params, x), scan_k),
    }


def main():
    variants = build_variants()
    out = {"backend": jax.default_backend(), "B": 128}
    runs = {}
    for name, (call, per) in variants.items():
        t0 = time.time()
        np.asarray(call())
        print(f"[compile] {name}: {time.time() - t0:.1f}s", flush=True)

        def run(q, call=call):
            t0 = time.time()
            for _ in range(q):
                r = call()
            np.asarray(r)
            return time.time() - t0

        run(2)
        runs[name] = (run, per)

    best = {name: float("inf") for name in runs}
    rounds = 6
    for r in range(rounds):
        row = []
        for name, (run, per) in runs.items():
            iters = 30 if name.startswith("fwd") else 120
            dt, _ = robust_slope(run, iters, outer=1)
            us = dt * 1e6 / per
            best[name] = min(best[name], us)
            row.append(f"{name}: {us:.1f}us")
        print(f"round {r}: " + " | ".join(row), flush=True)

    out["best_us_per_iter"] = {k: round(v, 1) for k, v in best.items()}
    out["dispatch_us"] = round(best["noop"], 1)
    out["fwd_minus_dispatch_us"] = round(best["fwd"] - best["noop"], 1)
    out["scan_amortization_us"] = round(
        best["fwd"] - best[[k for k in best if "scan" in k][0]], 1
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
