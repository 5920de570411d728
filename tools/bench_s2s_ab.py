"""Same-process A/B of the seq2seq teacher-forced train step: batched vs
per-step decoder.

``seq2seq_log_prob(batched=True)`` hoists the step embeddings out of the
decode scan (one (B,U,L)@(L,E) matmul) and batches the output projections +
log-softmax after it ((U,B,H)@(H,L)), leaving only the sequential
attention + GRUCell chain in the scan; ``batched=False`` is the
reference-shaped per-step path (ref models.py:515-556 recomputes embed and
projection inside its Python loop). The chip/relay swings ±40% across
minutes, so the comparison interleaves both REAL Trainer jits in one
process (tools/bench_train_ab.py pattern; trace-time switch
TPU_SLU_S2S_PERSTEP).

Run: python tools/bench_s2s_ab.py [--batch 64] [--steps 32] [--rounds 6]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--seconds", type=float, default=4.0)
    parser.add_argument("--steps", type=int, default=32,
                        help="decode steps U (bench.py uses 32)")
    parser.add_argument("--rounds", type=int, default=6)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        ),
    )

    import __graft_entry__
    from bench import robust_slope
    from tpu_slu.models.slu import Model
    from tpu_slu.training.optim import expand_mask
    from tpu_slu.training.trainer import Trainer

    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=False)
    config.seq2seq = True
    config.Sy_intent = ["<sos>"] + [chr(32 + i) for i in range(95)] + ["<eos>"]
    config.intent_encoder_dim = 128
    config.num_intent_encoder_layers = 1
    config.intent_decoder_dim = 256
    config.num_intent_decoder_layers = 2
    config.intent_decoder_key_dim = 128
    config.intent_decoder_value_dim = 256
    config.seq2seq_max_decode_len = 200

    Bt, U = args.batch, args.steps
    T = int(args.seconds * 16000)
    model = Model(config)
    Sy = len(config.Sy_intent)
    r = np.random.default_rng(5)
    labels = r.integers(1, Sy - 1, (Bt, U))
    labels[:, 0] = model.SOS
    labels[:, -1] = Sy - 1
    batch = {
        "x": jnp.asarray(r.standard_normal((Bt, T), np.float32)),
        "y_intent": jnp.asarray(np.eye(Sy, dtype=np.float32)[labels]),
        "w": jnp.ones((Bt,), jnp.float32),
        "len": jnp.full((Bt,), T, jnp.int32),
        "y_len": jnp.full((Bt,), U, jnp.int32),
    }
    mask = jax.device_put(expand_mask(model.params, model.trainable_mask()))

    variants = []
    for spec, val in (("batched", ""), ("per-step", "1")):
        old = os.environ.get("TPU_SLU_S2S_PERSTEP")
        os.environ["TPU_SLU_S2S_PERSTEP"] = val
        try:
            trainer = Trainer(model, config)
            t0 = time.time()
            p, o, (loss, _) = trainer._train_step(
                trainer._params_carry(), trainer.opt_state, mask,
                trainer._next_step_idx(), batch,
            )
            np.asarray(loss)
            print(f"[compile] {spec}: {time.time() - t0:.1f}s", flush=True)
            state = {"p": p, "o": o}
        finally:
            if old is None:
                del os.environ["TPU_SLU_S2S_PERSTEP"]
            else:
                os.environ["TPU_SLU_S2S_PERSTEP"] = old

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
        run(2)

    best = {spec: float("inf") for spec, _ in variants}
    means = {spec: [] for spec, _ in variants}
    for rd in range(args.rounds):
        row = []
        for spec, run in variants:
            dt, fb = robust_slope(run, args.iters, outer=1)
            best[spec] = min(best[spec], dt)
            means[spec].append(dt)
            row.append(f"{spec}: {dt * 1000:.3f} ms{' (fb)' if fb else ''}")
        print(f"round {rd}: " + " | ".join(row), flush=True)

    print("---- best (min over rounds, ms/step) ----")
    for spec, _ in variants:
        print(f"{spec}: {best[spec] * 1000:.3f} ms "
              f"(mean {np.mean(means[spec]) * 1000:.3f})", flush=True)


if __name__ == "__main__":
    main()
