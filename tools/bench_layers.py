"""Per-stage decomposition of the flagship encoder forward on the real chip.

Times (two-point slope, interleaved rounds, one process): the conv front-end
alone, each bi-GRU stage alone at its true shape, and the whole encoder —
so the budget says which stage owns the wall time. Optional per-stage
time_block sweep.

Run: python tools/bench_layers.py [--batch 128] [--rounds 5] [--tb 0]
     (--tb N forces the forward time block for the GRU stages)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(run, iters, rounds):
    es = []
    for _ in range(rounds):
        run(1)
        t1 = min(run(1) for _ in range(3))
        tk = min(run(iters + 1) for _ in range(2))
        if tk - t1 > 0.2 * tk:
            es.append((tk - t1) / iters)
    return min(es) if es else float("nan")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--seconds", type=float, default=4.0)
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument("--iters", type=int, default=60)
    parser.add_argument("--tb", type=int, default=0)
    args = parser.parse_args()

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
    from tpu_slu.ops.pallas_gru import bigru_apply_shared

    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=False)
    model = Model(config)
    earch = model.encoder_arch
    params = model.params["pretrained_model"]
    B, T = args.batch, int(args.seconds * 16000)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T), np.float32))
    tb = args.tb or None

    # --- stage jits -------------------------------------------------------
    conv_specs = []
    for s in earch.phoneme_layers:
        if s.kind in ("gru", "select"):
            break
        conv_specs.append(s)

    # every stage returns a SCALAR (full reduction): queueing 60 iterations
    # of a 26 MB output churns the allocator and the relay; the sum keeps
    # all compute live for a one-pass read.
    def conv_only(p, x):
        out, _, _ = enc._apply_stack(
            p["phoneme_layers"], tuple(conv_specs), x[:, None, :],
            train=False, rng=None, gru_impl="pallas",
        )
        return jnp.sum(out if not isinstance(out, enc.PartsTM) else out[0])

    stages = [("conv_frontend", jax.jit(conv_only), (params, x))]

    # per-GRU stage at its true (T, D) shape, pooled like the real stack
    gru_shapes = []
    t = T
    for spec in earch.phoneme_layers:
        if spec.kind in ("sinc", "conv"):
            h = spec.h
            k, stride, pad = (h[1], h[3], h[4]) if spec.kind == "sinc" else (h[2], h[3], h[4])
            t = (t + 2 * pad - k) // stride + 1
        elif spec.kind == "pool":
            t = -(-t // spec.h[0])
    for group, specs in (("phoneme_layers", earch.phoneme_layers),
                         ("word_layers", earch.word_layers)):
        it = list(specs)
        for i, spec in enumerate(it):
            if spec.kind != "gru":
                continue
            d_in, hidden, _ = spec.h
            ds = next((s.h for s in it[i:] if s.kind == "downsample"), ("none", 1))
            gru_shapes.append((group, str(spec.index), t, d_in, hidden, ds))
            if ds[1] > 1:
                t = -(-t // ds[1])

    for group, idx, t_in, d_in, hidden, (ds_m, ds_k) in gru_shapes:
        gp = params[group][idx]
        if d_in == 256:
            parts = (
                jnp.asarray(rng.standard_normal((t_in, B, 128), np.float32)),
                jnp.asarray(rng.standard_normal((t_in, B, 128), np.float32)),
            )
        else:
            parts = (jnp.asarray(rng.standard_normal((t_in, B, d_in), np.float32)),)

        def stage(gp, parts, ds_m=ds_m, ds_k=ds_k):
            h_f, h_b, _ = bigru_apply_shared(
                gp, parts, time_block=tb,
                pool=ds_k if ds_m in ("avg", "max") else 1, pool_method=ds_m,
            )
            return jnp.sum(h_f) + jnp.sum(h_b)

        stages.append((f"{group[:4]}.{idx} T={t_in} D={d_in}",
                       jax.jit(stage), (gp, parts)))

    fwd = jax.jit(
        lambda p, x: jnp.sum(enc.encoder_features(p, earch, x, gru_impl="pallas"))
    )
    stages.append(("FULL encoder (sum)", fwd, (params, x)))

    for name, fn, fargs in stages:
        t0 = time.time()
        # sync via a host fetch — block_until_ready is unreliable through the relay
        np.asarray(jax.tree.leaves(fn(*fargs))[0])
        print(f"compiled {name}: {time.time() - t0:.1f}s", flush=True)

    results = {}
    for r in range(args.rounds):
        for name, fn, fargs in stages:
            def run(k):
                t0 = time.time()
                for _ in range(k):
                    out = fn(*fargs)
                np.asarray(jax.tree.leaves(out)[0])
                return time.time() - t0

            dt = slope(run, args.iters, 1)
            results.setdefault(name, []).append(dt)
        print(f"round {r + 1}/{args.rounds}", flush=True)

    print(f"\n{'stage':>28} {'best us':>9}")
    total = 0.0
    for name, es in results.items():
        best = min(e for e in es if e == e) if any(e == e for e in es) else float("nan")
        if not name.startswith("FULL"):
            total += best
        print(f"{name:>28} {best * 1e6:>9.0f}")
    print(f"{'sum of stages':>28} {total * 1e6:>9.0f}")


if __name__ == "__main__":
    main()
