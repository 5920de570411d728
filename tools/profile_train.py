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
    from tpu_slu.ops.gru import resolve_gru_impl
    from tpu_slu.training.optim import flat_adam_init, flat_adam_update
    from tpu_slu.utils.profiling import profile_trace

    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=False)
    model = Model(config)
    earch, iarch = model.encoder_arch, model.intent_arch
    impl = resolve_gru_impl(config)

    B, T = args.batch, int(args.seconds * 16000)
    r = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(r.standard_normal((B, T), np.float32)),
        "y": jnp.asarray(
            np.stack([r.integers(0, n, B) for n in iarch.values_per_slot], 1).astype(np.int32)
        ),
        "w": jnp.ones((B,), jnp.float32),
    }
    rng = jax.random.key(0, impl="rbg")

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            r1, r2 = jax.random.split(rng)
            feats = enc.encoder_features(
                p["pretrained_model"], earch, batch["x"], train=True, rng=r1, gru_impl=impl
            )
            logits = slu_mod.intent_logits(
                p["intent_layers"], iarch, feats, train=True, rng=r2, gru_impl=impl
            )
            return slu_mod.intent_loss_acc(logits, batch["y"], iarch.values_per_slot, batch["w"])

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        mask = jax.tree.map(lambda _: 1.0, params)
        params, opt_state = flat_adam_update(params, grads, opt_state, mask, 1e-3)
        return params, opt_state, loss

    params, opt = model.params, flat_adam_init(model.params)
    params, opt, loss = step(params, opt, batch)  # compile outside the trace
    np.asarray(loss)

    with profile_trace(args.logdir):
        for _ in range(args.steps):
            params, opt, loss = step(params, opt, batch)
        np.asarray(loss)
    print(f"trace for {args.steps} steps written to {args.logdir} (loss={float(loss):.4f})")


if __name__ == "__main__":
    main()
