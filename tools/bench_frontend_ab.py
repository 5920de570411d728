"""Same-process A/B: fused sinc front end (ops/pallas_frontend.py) vs the
XLA sinc->abs->pool->act composition, at the flagship shape.

Both variants run through enc._apply_stack over the conv specs only:
gru_impl="pallas" hits the fused kernel gate, "pallas-nochain" takes the
unfused XLA ops. Interleaved two-point-slope rounds defeat the relay's
±40% windows (CLAUDE.md measurement discipline).

Run: python tools/bench_frontend_ab.py [--batch 128] [--rounds 6]
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
    parser.add_argument("--seconds", type=float, default=4.0)
    parser.add_argument("--rounds", type=int, default=6)
    parser.add_argument("--iters", type=int, default=80)
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

    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=False)
    model = Model(config)
    earch = model.encoder_arch
    params = model.params["pretrained_model"]
    B, T = args.batch, int(args.seconds * 16000)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T), np.float32))

    conv_specs = []
    for s in earch.phoneme_layers:
        if s.kind in ("gru", "select"):
            break
        conv_specs.append(s)

    def front(p, x, impl):
        out, _, _ = enc._apply_stack(
            p["phoneme_layers"], tuple(conv_specs), x[:, None, :],
            train=False, rng=None, gru_impl=impl,
        )
        return jnp.sum(out if not isinstance(out, enc.PartsTM) else out[0])

    variants = [
        ("fused", jax.jit(lambda p, x: front(p, x, "pallas"))),
        ("xla", jax.jit(lambda p, x: front(p, x, "pallas-nochain"))),
    ]
    for name, fn in variants:
        t0 = time.time()
        np.asarray(fn(params, x))
        print(f"compiled {name}: {time.time() - t0:.1f}s", flush=True)

    def run(fn, k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(params, x)
        np.asarray(r)
        return time.perf_counter() - t0

    results = {name: [] for name, _ in variants}
    for r in range(args.rounds):
        for name, fn in variants:
            run(fn, 1)
            t1 = min(run(fn, 1) for _ in range(3))
            tk = min(run(fn, args.iters + 1) for _ in range(2))
            if tk - t1 > 0.2 * tk:
                results[name].append((tk - t1) / args.iters * 1e3)
        print(
            f"round {r}: "
            + "  ".join(
                f"{n}={results[n][-1]:.4f}ms" if results[n] else f"{n}=?"
                for n, _ in variants
            ),
            flush=True,
        )
    for name, _ in variants:
        es = results[name]
        if es:
            print(f"{name}: best {min(es):.4f} ms  median {np.median(es):.4f} ms")


if __name__ == "__main__":
    main()
