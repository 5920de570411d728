"""Attribute the SLU train step's time and bound it with an additive floor.

Round 5 closed the encoder FORWARD's residual (tools/bench_gatechain.py:
HBM 316 + chain 114 = 430 us vs 434.7 measured at B=128, sol 0.99). The
train step (fwd + bwd + masked flat Adam, bench.py ``train_step_ms``,
history 10.7 -> 1.72 ms) has never had the same treatment: we know the list
of optimizations that got it here (docs/KERNELS.md), but not how far the
result sits from what the chip can do. This tool produces that number.

Measured, same-process interleaved (the only trustworthy comparison through
the +-40% windowed relay — CLAUDE.md):

- ``full``  — the REAL ``Trainer._train_step`` (donated carries, traced
  mask, in-jit fold_in RNG), exactly what bench.py times.
- ``grad``  — value_and_grad of the IDENTICAL loss (same encoder/intent
  calls on unraveled views, same dropout RNG derivation), no clip/Adam:
  fwd + bwd only.
- ``fwd``   — the loss alone (train=True, dropout on): the forward as the
  autodiff primal actually runs it.
- ``adam``  — ``flat_adam_vector_update`` alone on (P,) vectors (donated),
  the step's optimizer tail in isolation.

Attribution: bwd = grad - fwd, step plumbing = full - grad (cross-checked
against the isolated ``adam``). Each term is a queue slope (k queued
executions + one sync minus the 1-execution baseline) so the relay RPC and
the 100-320 us per-program dispatch floor divide out of the differences.

Additive floor model (each term optimistic, so the sum lower-bounds any
achievable step):

- fwd_floor  = min_encoder_hbm_bytes(B)/BW + gate-chain floor(B) — the
  verified encoder-forward floor (experiments/gatechain_floor_v5e.json);
  the intent head (T<=25 frames) is charged nothing.
- bwd_floor  = 2x fwd HBM (the bwd kernel re-reads x and h_prev to
  recompute gates, reads dY at the pooled rate and writes dX — about the
  forward's traffic twice; ops/pallas_gru.py "_fused_bwd_kernel")
  + 2x chain (the sequential dh chain costs one fwd-chain equivalent —
  same elementwise count plus one (B,3H)x(3H,H) matmul — and the batched
  gate recompute in the prologue costs another at the same VPU
  throughput, since the chain is throughput-bound, not latency-bound).
- adam_floor = 10P f32 HBM moves (reads p, g, m, v, step, mask; writes
  p, m, v, step — training/optim.py flat_adam_vector_update) at 819 GB/s.

Writes experiments/trainstep_floor_v5e.json with the measured terms, the
floor decomposition, and ``sol_frac_train`` = floor / measured full step.

Usage: python tools/bench_trainstep_floor.py [--batch 64] [--seconds 4]
       [--rounds 5] [--iters 20]   (real TPU; compiles ~4 fresh
       executables — run in background with a generous timeout)
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--seconds", type=float, default=4.0)
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "experiments", "trainstep_floor_v5e.json"))
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )

    import __graft_entry__
    from bench import V5E_HBM_GBPS, min_encoder_hbm_bytes, robust_slope
    from tpu_slu.models import encoder as enc
    from tpu_slu.models import slu as slu_mod
    from tpu_slu.models.slu import Model
    from tpu_slu.ops.gru import resolve_gru_impl
    from tpu_slu.training.optim import expand_mask, flat_adam_vector_update
    from tpu_slu.training.trainer import Trainer

    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=False)
    model = Model(config)
    earch = model.encoder_arch
    iarch = model.intent_arch
    gru_impl = resolve_gru_impl(config)

    Bt = args.batch
    T = int(args.seconds * 16000)
    batch = {
        "x": jnp.asarray(
            np.random.default_rng(0).standard_normal((Bt, T), np.float32)),
        "y_intent": jnp.asarray(np.stack(
            [np.random.default_rng(2).integers(0, n, Bt)
             for n in iarch.values_per_slot], 1).astype(np.int32)),
        "w": jnp.ones((Bt,), jnp.float32),
        "len": jnp.full((Bt,), T, jnp.int32),
    }
    mask = jax.device_put(expand_mask(model.params, model.trainable_mask()))

    trainer = Trainer(model, config)
    unravel = trainer._unravel
    base_rng = trainer._base_rng

    # The trainer's loss body, verbatim (trainer.py loss_fn_builder,
    # non-seq2seq): full-length batch, so the frame mask is all-ones and
    # mask_padding adds no work beyond what the real step pays.
    def loss_fn(p, step_idx):
        rng = jax.random.fold_in(base_rng, step_idx)
        r1, r2 = jax.random.split(rng)
        pt = unravel(p)
        feats = enc.encoder_features(
            pt["pretrained_model"], earch, batch["x"], train=True, rng=r1,
            gru_impl=gru_impl)
        t_out = enc.frames_through(iarch.layers, feats.shape[1])
        fm = slu_mod.frame_mask_from_lengths(earch, batch["len"], t_out, iarch)
        logits = slu_mod.intent_logits(
            pt["intent_layers"], iarch, feats, train=True, rng=r2,
            gru_impl=gru_impl, frame_mask=fm)
        loss, _ = slu_mod.intent_loss_acc(
            logits, batch["y_intent"], iarch.values_per_slot, batch["w"])
        return loss

    fwd_jit = jax.jit(loss_fn)

    def grad_fn(p, step_idx):
        return jax.value_and_grad(loss_fn)(p, step_idx)

    grad_jit = jax.jit(grad_fn)

    lr = trainer.lr

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def adam_fn(p, state, g):
        p, state = flat_adam_vector_update(p, g, state, mask, lr)
        return p, state

    # ---- build runs (each threads its own state; sync via np.asarray) ----
    p0 = trainer._params_carry()
    opt0 = trainer.opt_state
    step_counter = {"i": 0}

    def next_idx():
        step_counter["i"] += 1
        return np.int32(step_counter["i"])

    full_state = {}

    def full_run(k):
        p, o = full_state["p"], full_state["o"]
        t0 = time.time()
        loss = None
        for _ in range(k):
            p, o, (loss, _) = trainer._train_step(p, o, mask, next_idx(), batch)
        np.asarray(loss)
        full_state["p"], full_state["o"] = p, o
        return time.time() - t0

    def fwd_run(k):
        t0 = time.time()
        loss = None
        for _ in range(k):
            loss = fwd_jit(p0, next_idx())
        np.asarray(loss)
        return time.time() - t0

    def grad_run(k):
        t0 = time.time()
        loss = None
        for _ in range(k):
            loss, _ = grad_jit(p0, next_idx())
        np.asarray(loss)
        return time.time() - t0

    adam_state = {}

    def adam_run(k):
        p, s = adam_state["p"], adam_state["s"]
        t0 = time.time()
        for _ in range(k):
            p, s = adam_fn(p, s, adam_state["g"])
        np.asarray(p[:1])
        adam_state["p"], adam_state["s"] = p, s
        return time.time() - t0

    # ---- compile each variant (cold remote compiles: minutes) ----
    compile_s = {}
    t0 = time.time()
    p, o, (loss, _) = trainer._train_step(p0, opt0, mask, next_idx(), batch)
    np.asarray(loss)
    full_state["p"], full_state["o"] = p, o
    compile_s["full"] = round(time.time() - t0, 1)
    print(f"[compile] full: {compile_s['full']}s", flush=True)
    # The full step donated p0/opt0 — rebuild fresh non-donated copies for
    # the fwd/grad/adam jits (reading a donated buffer raises).
    p0 = trainer._params_carry()
    trainer.opt_state = jax.tree.map(jnp.copy, full_state["o"])

    t0 = time.time()
    np.asarray(fwd_jit(p0, next_idx()))
    compile_s["fwd"] = round(time.time() - t0, 1)
    print(f"[compile] fwd: {compile_s['fwd']}s", flush=True)

    t0 = time.time()
    loss, g = grad_jit(p0, next_idx())
    np.asarray(loss)
    compile_s["grad"] = round(time.time() - t0, 1)
    print(f"[compile] grad: {compile_s['grad']}s", flush=True)

    adam_state["p"] = jnp.copy(p0)
    adam_state["s"] = jax.tree.map(jnp.copy, trainer.opt_state)
    adam_state["g"] = g
    t0 = time.time()
    a_p, a_s = adam_fn(adam_state["p"], adam_state["s"], g)
    np.asarray(a_p[:1])
    adam_state["p"], adam_state["s"] = a_p, a_s
    compile_s["adam"] = round(time.time() - t0, 1)
    print(f"[compile] adam: {compile_s['adam']}s", flush=True)

    runs = [("full", full_run), ("grad", grad_run), ("fwd", fwd_run),
            ("adam", adam_run)]
    for _, run in runs:
        run(2)  # warm

    # ---- interleaved rounds ----
    best = {name: float("inf") for name, _ in runs}
    for r in range(args.rounds):
        row = []
        for name, run in runs:
            iters = args.iters * (4 if name == "adam" else 1)
            dt, fb = robust_slope(run, iters, outer=1)
            best[name] = min(best[name], dt)
            row.append(f"{name}: {dt * 1e3:.3f} ms{' (fb)' if fb else ''}")
        print(f"round {r}: " + " | ".join(row), flush=True)

    full_us = best["full"] * 1e6
    fwd_us = best["fwd"] * 1e6
    grad_us = best["grad"] * 1e6
    adam_us = best["adam"] * 1e6
    bwd_us = grad_us - fwd_us
    plumb_us = full_us - grad_us

    # ---- floor model ----
    P = int(sum(np.prod(jnp.shape(x)) for x in jax.tree.leaves(model.params)))
    hbm_us = min_encoder_hbm_bytes(earch, Bt, T) / (V5E_HBM_GBPS * 1e9) * 1e6
    chain_us = None
    try:
        with open(os.path.join(os.path.dirname(args.out),
                               "gatechain_floor_v5e.json")) as f:
            chain_us = json.load(f)["floor_us"].get(str(Bt))
    except Exception:
        pass
    chain_us = chain_us or 0.0
    fwd_floor = hbm_us + chain_us
    bwd_floor = 2.0 * hbm_us + 2.0 * chain_us
    adam_floor = 10.0 * P * 4 / (V5E_HBM_GBPS * 1e9) * 1e6
    train_floor = fwd_floor + bwd_floor + adam_floor

    out = {
        "device": jax.devices()[0].device_kind,
        "batch": Bt,
        "t_samples": T,
        "params": P,
        "compile_s": compile_s,
        "measured_us": {
            "full": round(full_us, 1),
            "fwd": round(fwd_us, 1),
            "grad": round(grad_us, 1),
            "adam_isolated": round(adam_us, 1),
            "bwd_delta": round(bwd_us, 1),
            "plumbing_delta": round(plumb_us, 1),
        },
        "floor_us": {
            "fwd": round(fwd_floor, 1),
            "bwd": round(bwd_floor, 1),
            "adam": round(adam_floor, 1),
            "train": round(train_floor, 1),
            "hbm_component": round(hbm_us, 1),
            "chain_component": round(chain_us, 1),
        },
        "sol_frac_train": round(train_floor / full_us, 3) if full_us else None,
        "sol_frac_fwd": round(fwd_floor / fwd_us, 3) if fwd_us else None,
        "sol_frac_bwd": round(bwd_floor / bwd_us, 3) if bwd_us > 0 else None,
        "sol_frac_adam": round(adam_floor / adam_us, 3) if adam_us else None,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
