"""Same-process A/B of encoder-forward variants on the real chip.

The relay/chip throughput swings ±40% across minutes (CLAUDE.md), so
cross-process comparisons lie; this tool measures every requested variant
with interleaved rounds in ONE process and prints a table.

Run: python tools/bench_ab.py --batches 128,256 --impls pallas,pallas-nochain
     [--seconds 4] [--rounds 6] [--iters 60]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", default="128,256")
    parser.add_argument("--impls", default="pallas,pallas-nochain")
    parser.add_argument("--seconds", type=float, default=4.0)
    parser.add_argument("--rounds", type=int, default=6)
    parser.add_argument("--iters", type=int, default=60)
    parser.add_argument("--dtypes", default="float32",
                        help="comma list; every (batch, impl, dtype) combo is a variant")
    parser.add_argument("--envs", default="",
                        help="comma list of NAME=VAL trace-time env settings, "
                             "one more variant axis (e.g. TPU_SLU_GRU_ROWSTACK=0,"
                             "TPU_SLU_GRU_ROWSTACK=1); kernels read these while "
                             "tracing, so each setting compiles its own variant")
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

    T = int(args.seconds * 16000)
    variants = []
    for b in (int(x) for x in args.batches.split(",")):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((b, T), np.float32))
        for impl in args.impls.split(","):
            for dt in args.dtypes.split(","):
                for env in args.envs.split(",") if args.envs else [""]:
                    if env:
                        name, _, val = env.partition("=")
                        os.environ[name] = val
                    cd = jnp.bfloat16 if dt == "bfloat16" else None
                    fwd = jax.jit(
                        lambda p, x, impl=impl, cd=cd: jnp.sum(
                            enc.encoder_features(
                                p, earch, x, gru_impl=impl, compute_dtype=cd
                            ).astype(jnp.float32)
                        )
                    )
                    t0 = time.time()
                    np.asarray(fwd(params, x))
                    tag = f"{b}/{impl}/{dt}" + (f"/{env}" if env else "")
                    print(f"compiled {tag}: {time.time() - t0:.1f}s", flush=True)
                    variants.append((tag, b, fwd, x))

    results = {name: [] for name, _, _, _ in variants}
    for r in range(args.rounds):
        for name, b, fwd, x in variants:
            def run(k):
                t0 = time.time()
                for _ in range(k):
                    out = fwd(params, x)
                np.asarray(out)
                return time.time() - t0

            run(1)
            t1 = min(run(1) for _ in range(3))
            tk = min(run(args.iters + 1) for _ in range(2))
            if tk - t1 > 0.2 * tk:
                results[name].append((tk - t1) / args.iters)
        print(f"round {r + 1}/{args.rounds} done", flush=True)

    print(f"\n{'variant':>28} {'best ms':>9} {'median ms':>10} {'utt/s':>9}")
    for (name, b, _, _) in variants:
        es = results[name]
        if not es:
            print(f"{name:>28} {'degenerate':>9}")
            continue
        best, med = min(es), float(np.median(es))
        print(f"{name:>28} {best * 1e3:>9.3f} {med * 1e3:>10.3f} {b / best:>9.0f}")


if __name__ == "__main__":
    main()
