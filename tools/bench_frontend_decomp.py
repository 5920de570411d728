"""Decompose the front-end A/B: which stage regresses under the fused path?

Stages timed same-process, interleaved:
  sinc_fused   — pallas_frontend.sinc_frontend_fused (sinc+abs+pool+act)
  sinc_xla     — sinc_conv -> abs -> ceil pool -> act (NCL)
  convs_nhc    — the two 5-tap convs + act on channels-last input
  convs_ncl    — same on channels-first input

Run: python tools/bench_frontend_decomp.py [--batch 128] [--rounds 6]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--rounds", type=int, default=6)
    parser.add_argument("--iters", type=int, default=80)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    from tpu_slu import ops
    from tpu_slu.ops.pallas_frontend import sinc_frontend_fused, _act
    from tpu_slu.ops.sinc import mel_init, sinc_conv

    B, T = args.batch, 64000
    F, K, S, POOL = 80, 401, 80, 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T), np.float32))
    b1, band = (jnp.asarray(a) for a in mel_init(F, 16000))

    t_pool = -(-((T - K) // S + 1) // POOL)  # 398
    h_nhc = jnp.asarray(rng.standard_normal((B, t_pool, F), np.float32))
    h_ncl = jnp.asarray(jnp.swapaxes(h_nhc, 1, 2))
    w1 = jnp.asarray(rng.standard_normal((60, 80, 5), np.float32) * 0.1)
    bb1 = jnp.zeros((60,), np.float32)
    w2 = jnp.asarray(rng.standard_normal((60, 60, 5), np.float32) * 0.1)
    bb2 = jnp.zeros((60,), np.float32)

    def sinc_fused(b1, band, x):
        return jnp.sum(sinc_frontend_fused(
            b1, band, x, filt_dim=K, fs=16000, stride=S, padding=0, pool=POOL))

    def sinc_xla(b1, band, x):
        out = jnp.abs(sinc_conv(b1, band, x[:, None, :], K, 16000, S, 0))
        return jnp.sum(_act(ops.max_pool1d_ceil(out, POOL), "leaky_relu"))

    def convs_nhc(h):
        o = _act(ops.conv1d_nhc(h, w1, bb1, stride=1, padding=2), "leaky_relu")
        o = _act(ops.conv1d_nhc(o, w2, bb2, stride=1, padding=2), "leaky_relu")
        return jnp.sum(o)

    def convs_ncl(h):
        o = _act(ops.conv1d(h, w1, bb1, stride=1, padding=2), "leaky_relu")
        o = _act(ops.conv1d(o, w2, bb2, stride=1, padding=2), "leaky_relu")
        return jnp.sum(o)

    variants = [
        ("sinc_fused", jax.jit(sinc_fused), (b1, band, x)),
        ("sinc_xla", jax.jit(sinc_xla), (b1, band, x)),
        ("convs_nhc", jax.jit(convs_nhc), (h_nhc,)),
        ("convs_ncl", jax.jit(convs_ncl), (h_ncl,)),
    ]
    for name, fn, fa in variants:
        t0 = time.time()
        np.asarray(fn(*fa))
        print(f"compiled {name}: {time.time() - t0:.1f}s", flush=True)

    def run(fn, fa, k):
        r = None
        t0 = time.perf_counter()
        for _ in range(k):
            r = fn(*fa)
        np.asarray(r)
        return time.perf_counter() - t0

    results = {name: [] for name, _, _ in variants}
    for r in range(args.rounds):
        for name, fn, fa in variants:
            run(fn, fa, 1)
            t1 = min(run(fn, fa, 1) for _ in range(3))
            tk = min(run(fn, fa, args.iters + 1) for _ in range(2))
            if tk - t1 > 0.2 * tk:
                results[name].append((tk - t1) / args.iters * 1e3)
        print(
            f"round {r}: "
            + "  ".join(
                f"{n}={results[n][-1]:.4f}" if results[n] else f"{n}=?"
                for n, _, _ in variants
            ),
            flush=True,
        )
    for name, _, _ in variants:
        es = results[name]
        if es:
            print(f"{name}: best {min(es):.4f} ms  median {np.median(es):.4f} ms")


if __name__ == "__main__":
    main()
