"""Close the residual perf question: a gate-chain issue-cost floor that is
batch-scaling-consistent with the measured encoder device walls.

VERDICT r4 "what's weak" #3: the r4 attribution concluded the stable
440-455 us B=128 device time is "per-step serial latency", yet B=256 scales
*exactly 2x* with batch-invariant sol_frac — pure serial latency would
amortize with batch; exact-2x is a throughput signature. The existing VPU
floor (bench.py encoder_unit_floors_us) charges bulk chain rates measured on
(32768, 128) arrays (tools/bench_vpu.py), which amortize per-op issue cost
that (B, 3H) = (128, 384) gate tiles do not.

This tool measures the *actual per-step cost of the production recurrence* at
the kernel's own shapes, same-process interleaved (the only trustworthy A/B
through the windowed relay — CLAUDE.md):

- ``joint_full``  — the production step body verbatim (both directions:
  bf16-MXU h@Whh + bhh, fused r|z sigmoid via the tanh identity, n-tanh,
  n + z*(h-n) update), tb-blocked grid, fully unrolled, VMEM-resident.
  Replays ops/pallas_gru.py:_fused_fwd_kernel's ``one``/``step``
  (pallas_gru.py:347-365) with the gi stream pre-materialized so no HBM
  streaming or input projection is on the clock.
- ``joint_nomxu`` — same chain with the recurrent matmul replaced by a
  lane-broadcast perturbation (gh = gi*c + h[:, :1]) so the serial
  dependence survives but the MXU leaves the chain: isolates the VPU's
  share of the per-step cost.
- ``indep``       — same op sequence, dependence across steps broken
  (every step reads the same initial h, varied only by a scalar): the
  *throughput* cost of the same instruction stream. chain/indep ratio
  separates latency-bound (ratio >> 1) from issue/throughput-bound
  (ratio ~ 1).

Per-step cost is a two-point slope in S (step count) at fixed B, so
per-program and per-grid-entry overheads divide out, exactly like bench.py's
queue slope divides out the relay RPC. The S points must BOTH sit well above
the 100-320 us per-program dispatch floor: the floor is non-additive
(queued executions overlap device compute, so per-call cost is roughly
max(floor, kernel)), and a first run at S=256/1024 measured ~0 us/step
because both kernels finished under the floor — itself evidence the
VMEM-resident chain runs far below the production 0.59 us/step wall.
S=4096 vs 16384 puts the kernel at ~1-6 ms, floor-free slope territory.

The floor model: sum over the flagship's GRU layers of T_l * step_cost(B)
(every layer here is H=128 bidirectional; the joint kernel runs both
directions inside one grid step). Added to the measured conv front-end
time, this must reproduce the measured B-scaling of the full encoder
forward (device scan-of-8 walls, measured here in the same process) or the
model is wrong. Writes experiments/gatechain_floor_v5e.json.

Usage: python tools/bench_gatechain.py  (real TPU; ~10-20 min incl. the
three encoder-forward compiles; run in background)
"""

import functools
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import __graft_entry__
from bench import robust_slope
from tpu_slu.models import encoder as enc
from tpu_slu.models.slu import Model
from tpu_slu.ops.pallas_gru import (
    _interpret,
    _mxu,
    _sigmoid,
    _step_unroll,
    _vmem_params,
)

TB = 8  # production _auto_tb(16, 128) == 8: the flagship fwd block quantum

# Both slope points must exceed the 100-320 us dispatch floor by >3x (see
# module docstring): at the slowest plausible chain rate (~0.6 us/step) these
# are 2.5 ms / 10 ms kernels; at the fastest (~0.1) still 0.4 / 1.6 ms.
S_SHORT = 4096
S_LONG = 16384


def _chain_kernel(gi_ref, whhf_ref, bhhf_ref, whhb_ref, bhhb_ref,
                  out_ref, hf_ref, hb_ref, *, variant: str):
    """S dependent recurrence steps over VMEM-resident state.

    gi is a (TB, B, 3H) block re-read every grid entry (index_map pins block
    0) so the loop body is step-varying (gi_ref[u]) but no HBM stream or
    input projection sits on the measured chain."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        hf_ref[:] = jnp.full_like(hf_ref, 0.01)
        hb_ref[:] = jnp.full_like(hb_ref, -0.01)

    B, H = hf_ref.shape

    def one(gi, h, whh_ref, bhh_ref):
        if variant == "joint_nomxu":
            # keep the serial dependence (h enters every gate) without the
            # MXU: one lane-broadcast add replaces the matmul.
            gh = gi * 0.5 + h[:, :1]
        else:
            gh = (
                _mxu(h.astype(whh_ref.dtype), whh_ref[:])
                + bhh_ref[0].astype(jnp.float32)
            )
        rz = _sigmoid(gi[:, : 2 * H] + gh[:, : 2 * H])
        r, z = rz[:, :H], rz[:, H:]
        n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
        return n + z * (h - n)

    def step(u, carry):
        hf, hb = carry
        if variant == "indep":
            # break the cross-step chain: every step consumes the same
            # initial state (varied by a loop-dependent scalar so Mosaic
            # cannot hoist the body), and results accumulate associatively.
            s = 1.0 + jnp.float32(u) * 1e-4
            nf = one(gi_ref[u], hf_ref[:] * s, whhf_ref, bhhf_ref)
            nb = one(gi_ref[u], hb_ref[:] * s, whhb_ref, bhhb_ref)
            return hf + nf, hb + nb
        hf = one(gi_ref[u], hf, whhf_ref, bhhf_ref)
        hb = one(gi_ref[u], hb, whhb_ref, bhhb_ref)
        return hf, hb

    hf, hb = jax.lax.fori_loop(
        0, gi_ref.shape[0], step, (hf_ref[:], hb_ref[:]),
        unroll=_step_unroll(gi_ref.shape[0]),
    )
    if variant == "indep":
        out_ref[:] = (hf + hb) * 1e-3
    else:
        hf_ref[:] = hf
        hb_ref[:] = hb
        out_ref[:] = hf + hb


def chain_call(gi, whh_f, bhh_f, whh_b, bhh_b, steps: int, variant: str):
    B = gi.shape[1]
    H = whh_f.shape[0]
    kern = functools.partial(_chain_kernel, variant=variant)
    block_gi = pl.BlockSpec((TB, B, 3 * H), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(steps // TB,),
        in_specs=[block_gi] + [full] * 4,
        out_specs=pl.BlockSpec((B, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        compiler_params=_vmem_params(),
        interpret=_interpret(),
    )(gi, whh_f, bhh_f[None, :], whh_b, bhh_b[None, :])


def measure_chain(B: int, H: int, variant: str, iters: int = 60) -> float:
    """Per-recurrence-step cost (us) via a two-point slope in step count."""
    r = np.random.default_rng(0)
    gi = jnp.asarray(r.standard_normal((TB, B, 3 * H)).astype(np.float32)) * 0.3
    whh_f = jnp.asarray(r.standard_normal((H, 3 * H)).astype(np.float32)) * 0.05
    whh_b = jnp.asarray(r.standard_normal((H, 3 * H)).astype(np.float32)) * 0.05
    bhh = jnp.zeros((3 * H,), jnp.float32)

    def timed(steps):
        fn = jax.jit(functools.partial(
            chain_call, steps=steps, variant=variant))

        def go():
            return fn(gi, whh_f, bhh, whh_b, bhh)

        np.asarray(go())  # compile

        def run(k):
            t0 = time.time()
            out = None
            for _ in range(k):
                out = go()
            np.asarray(out)
            return time.time() - t0

        run(2)
        dt, fb = robust_slope(run, iters, outer=3, budget_s=40.0, min_s=8.0)
        return dt, fb

    t_short, fb1 = timed(S_SHORT)
    t_long, fb2 = timed(S_LONG)
    per_step_us = (t_long - t_short) / (S_LONG - S_SHORT) * 1e6
    return per_step_us, (fb1 or fb2)


def gru_layer_steps(arch, t_samples: int):
    """(T_l, H_l) per GRU layer of the flagship encoder, walking the spec
    chain exactly like bench.encoder_unit_floors_us."""
    t = t_samples
    out = []
    for spec in list(arch.phoneme_layers) + list(arch.word_layers):
        if spec.kind in ("sinc", "conv"):
            k, stride, pad = (spec.h[1], spec.h[3], spec.h[4]) \
                if spec.kind == "sinc" else (spec.h[2], spec.h[3], spec.h[4])
            t = (t + 2 * pad - k) // stride + 1
        elif spec.kind == "pool":
            t = -(-t // spec.h[0])
        elif spec.kind == "downsample":
            if spec.h[1] > 1:
                t = -(-t // spec.h[1])
        elif spec.kind == "gru":
            _, hidden, bidir = spec.h
            assert bidir, "flagship layers are all bidirectional"
            out.append((t, hidden))
    return out


def measure_encoder_fwd(model, B: int, T: int, K: int = 8) -> float:
    """Stable device time (us) of the full encoder forward: K iterations in
    ONE program via lax.scan with loop-variant on-device inputs (the
    bench.py device_us_scan8 methodology)."""
    earch = model.encoder_arch
    params = model.params["pretrained_model"]
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((B, T), np.float32))

    def _scan_dev(p, xx):
        def body(acc, i):
            xi = xx * (1.0 + i.astype(jnp.float32) / K)
            # encoder_features defaults to gru_impl="scan" — without the
            # explicit "pallas" this measures the fallback (~3x slower,
            # observed 906 us B=64), not the production kernels.
            return acc + jnp.sum(
                enc.encoder_features(p, earch, xi, gru_impl="pallas")), None

        return jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))[0]

    fwd = jax.jit(_scan_dev)
    t0 = time.time()
    np.asarray(fwd(params, x))
    compile_s = time.time() - t0
    print(f"  encoder fwd B={B}: compiled in {compile_s:.0f}s", flush=True)

    def run(k):
        t0 = time.time()
        out = None
        for _ in range(k):
            out = fwd(params, x)
        np.asarray(out)
        return time.time() - t0

    run(2)
    sd, _ = robust_slope(run, 12, outer=3, budget_s=60.0, min_s=15.0)
    return sd * 1e6 / K


def main():
    dev = jax.devices()[0]
    print("device:", dev.device_kind, flush=True)
    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=False)
    model = Model(config)
    T = 4 * 16000
    layers = gru_layer_steps(model.encoder_arch, T)
    n_rec_steps = sum(t for t, _ in layers)
    H = layers[0][1]
    assert all(h == H for _, h in layers)
    print(f"flagship GRU layers (T, H): {layers} -> {n_rec_steps} "
          f"recurrence steps/fwd, H={H}", flush=True)

    batches = (64, 128, 256)
    variants = ("joint_full", "joint_nomxu", "indep")
    results = {"device": str(dev.device_kind), "tb": TB, "H": H,
               "layers_T": [t for t, _ in layers], "per_step_us": {},
               "encoder_fwd_us": {}, "floor_us": {}, "fallback": []}

    # interleave variants within each batch; batches outermost (the encoder
    # compile for each B happens adjacent to its chain measurements)
    for B in batches:
        for v in variants:
            us, fb = measure_chain(B, H, v)
            results["per_step_us"].setdefault(str(B), {})[v] = round(us, 4)
            if fb:
                results["fallback"].append(f"{v}@B{B}")
            print(f"B={B:3d} {v:12s}: {us:7.4f} us/step", flush=True)
        fwd_us = measure_encoder_fwd(model, B, T)
        results["encoder_fwd_us"][str(B)] = round(fwd_us, 1)
        floor = n_rec_steps * results["per_step_us"][str(B)]["joint_full"]
        results["floor_us"][str(B)] = round(floor, 1)
        print(f"B={B:3d} encoder fwd {fwd_us:7.1f} us | recurrence floor "
              f"{floor:7.1f} us ({floor / fwd_us:.2f} of wall)", flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "experiments", "gatechain_floor_v5e.json")
    results["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
