"""Same-process A/B: row-stacked vs split-chain shared forward kernels.

Times `bigru_apply_shared` eval forwards at the flagship stage shapes
(gru1/gru2-like: T=400, H=128, fused pool 2) with both kernel variants
traced in ONE process (TPU_SLU_GRU_ROWSTACK is read at trace time), rounds
interleaved so the relay's minute-scale throughput windows hit both equally.

Run: python tools/bench_rowstack.py [--batch 128] [--rounds 6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--rounds", type=int, default=6)
    parser.add_argument("--iters", type=int, default=60)
    parser.add_argument("--t", type=int, default=400)
    parser.add_argument("--hidden", type=int, default=128)
    parser.add_argument("--d", type=int, default=80)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from tpu_slu import ops
    from tpu_slu.ops import pallas_gru as pg

    rng = np.random.default_rng(0)
    B, T, H, D = args.batch, args.t, args.hidden, args.d
    gp = ops.gru_init(jax.random.PRNGKey(0), D, H, bidirectional=True)
    params = {"fwd": gp["fwd"], "bwd": gp["bwd"]}
    x = jnp.asarray(rng.standard_normal((T, B, D), dtype=np.float32))

    fns = {}
    for name, rs in (("rowstack", "1"), ("split", "0")):
        os.environ["TPU_SLU_GRU_ROWSTACK"] = rs

        def f(x, params):
            hf, hb, _ = pg.bigru_apply_shared(
                params, (x,), pool=2, pool_method="avg")
            return jnp.sum(hf[:1, :1, :1]) + jnp.sum(hb[:1, :1, :1])

        jf = jax.jit(f)
        t0 = time.time()
        out = jf(x, params)
        np.asarray(out)
        print(f"{name}: compiled in {time.time()-t0:.1f}s", flush=True)
        fns[name] = jf
    os.environ.pop("TPU_SLU_GRU_ROWSTACK", None)

    # sanity: identical math (rowstack folds biases -> float tolerance)
    a = np.asarray(fns["rowstack"](x, params))
    b = np.asarray(fns["split"](x, params))
    print("scalar outputs:", a, b, "diff", abs(a - b))

    def run(jf, k):
        t0 = time.time()
        outs = [jf(x, params) for _ in range(k)]
        np.asarray(outs[-1])
        return time.time() - t0

    best = {n: float("inf") for n in fns}
    for r in range(args.rounds):
        for name, jf in fns.items():
            run(jf, 1)
            t1 = min(run(jf, 1) for _ in range(3))
            tk = min(run(jf, args.iters + 1) for _ in range(2))
            if tk - t1 > 0.2 * tk:
                est = (tk - t1) / args.iters
                best[name] = min(best[name], est)
                print(f"  r{r} {name}: {est*1e6:.1f} us", flush=True)
    print({n: f"{v*1e6:.1f} us" for n, v in best.items()})


if __name__ == "__main__":
    main()
