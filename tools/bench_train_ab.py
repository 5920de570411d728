"""Same-process A/B of REAL Trainer train-step variants on the real chip.

The chip/relay throughput swings ±40% across minutes (CLAUDE.md), so the
fused train-path pool (round 4) must be judged against the unfused path with
interleaved rounds in ONE process, exactly like tools/bench_ab.py does for
the forward. Each variant is a fresh ``Trainer`` whose step jit is TRACED
with the requested env settings active (the kernels read env at trace time).

Run: python tools/bench_train_ab.py \
         --envs TPU_SLU_TRAIN_FUSED_POOL=0,TPU_SLU_TRAIN_FUSED_POOL=1
     [--batch 64] [--seconds 4] [--rounds 6] [--iters 30]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--seconds", type=float, default=4.0)
    parser.add_argument("--rounds", type=int, default=6)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument(
        "--envs",
        default="TPU_SLU_TRAIN_FUSED_POOL=0,TPU_SLU_TRAIN_FUSED_POOL=1",
        help="comma list of NAME=VAL trace-time env settings, one variant each",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        ),
    )
    import tempfile

    import __graft_entry__
    from bench import robust_slope
    from tpu_slu.models.slu import Model
    from tpu_slu.training.optim import expand_mask
    from tpu_slu.training.trainer import Trainer

    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=False)
    model = Model(config)
    iarch = model.intent_arch

    Bt = args.batch
    T = int(args.seconds * 16000)
    batch = {
        "x": jnp.asarray(
            np.random.default_rng(0).standard_normal((Bt, T), np.float32)
        ),
        "y_intent": jnp.asarray(
            np.stack(
                [
                    np.random.default_rng(2).integers(0, n, Bt)
                    for n in iarch.values_per_slot
                ],
                1,
            ).astype(np.int32)
        ),
        "w": jnp.ones((Bt,), jnp.float32),
        "len": jnp.full((Bt,), T, jnp.int32),
    }
    mask = jax.device_put(expand_mask(model.params, model.trainable_mask()))

    variants = []
    for spec in args.envs.split(","):
        name, val = spec.split("=", 1)
        # Trace with the env active: the first step call compiles the jit.
        old = os.environ.get(name)
        os.environ[name] = val
        try:
            trainer = Trainer(model, config)
            t0 = time.time()
            # The step DONATES its carries; thread the outputs forward.
            p, o, (loss, _) = trainer._train_step(
                trainer._params_carry(), trainer.opt_state, mask,
                trainer._next_step_idx(), batch,
            )
            np.asarray(loss)
            print(f"[compile] {spec}: {time.time() - t0:.1f}s", flush=True)
            state = {"p": p, "o": o}
        finally:
            if old is None:
                del os.environ[name]
            else:
                os.environ[name] = old

        def make_run(trainer=trainer, state=state):
            def run(k):
                p, o = state["p"], state["o"]
                t0 = time.time()
                for _ in range(k):
                    p, o, (loss, _) = trainer._train_step(
                        p, o, mask, trainer._next_step_idx(), batch
                    )
                np.asarray(loss)
                state["p"], state["o"] = p, o
                return time.time() - t0

            return run

        variants.append((spec, make_run()))

    for _, run in variants:
        run(2)  # warm

    # Interleaved rounds: each round measures every variant back to back.
    best = {spec: float("inf") for spec, _ in variants}
    for r in range(args.rounds):
        row = []
        for spec, run in variants:
            dt, fb = robust_slope(run, args.iters, outer=1)
            best[spec] = min(best[spec], dt)
            row.append(f"{spec}: {dt * 1000:.3f} ms{' (fb)' if fb else ''}")
        print(f"round {r}: " + " | ".join(row), flush=True)

    print("---- best (min over rounds, ms/step) ----")
    for spec, _ in variants:
        print(f"{spec}: {best[spec] * 1000:.3f}")


if __name__ == "__main__":
    main()
