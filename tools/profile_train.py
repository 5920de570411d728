"""Emit a jax.profiler trace of the flagship SLU train step on the TPU.

Produces a TensorBoard-loadable trace (XLA op breakdown, DMA overlap, HBM
usage) under --logdir. Companion to docs/KERNELS.md when hunting for the next
bottleneck.

Run: python tools/profile_train.py [--logdir /tmp/tpu_slu_trace] [--steps 10]
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", default="/tmp/tpu_slu_trace")
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--seconds", type=float, default=4.0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    import __graft_entry__
    from tpu_slu.models import encoder as enc
    from tpu_slu.models import slu as slu_mod
    from tpu_slu.models.slu import Model
    from tpu_slu.training.optim import expand_mask
    from tpu_slu.training.trainer import Trainer
    from tpu_slu.utils.profiling import profile_trace

    del enc, slu_mod  # the REAL Trainer jit is what we profile

    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=False)
    model = Model(config)
    iarch = model.intent_arch
    trainer = Trainer(model, config)

    B, T = args.batch, int(args.seconds * 16000)
    r = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(r.standard_normal((B, T), np.float32)),
        "y_intent": jnp.asarray(
            np.stack([r.integers(0, n, B) for n in iarch.values_per_slot], 1).astype(np.int32)
        ),
        "w": jnp.ones((B,), jnp.float32),
        "len": jnp.full((B,), T, jnp.int32),
    }
    mask = jax.device_put(expand_mask(model.params, model.trainable_mask()))
    p, o = trainer._params_carry(), trainer.opt_state

    def step(p, o):
        return trainer._train_step(p, o, mask, trainer._next_step_idx(), batch)

    p, o, (loss, _) = step(p, o)  # compile outside the trace
    np.asarray(loss)

    with profile_trace(args.logdir):
        for _ in range(args.steps):
            p, o, (loss, _) = step(p, o)
        np.asarray(loss)
    print(f"trace for {args.steps} steps written to {args.logdir} (loss={float(loss):.4f})")


if __name__ == "__main__":
    main()
