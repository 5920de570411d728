"""Seq2seq beam-search decode benchmark (informational, not driver-run).

The reference runs beam search on CPU in Python loops ("beam search is
memory-intensive; do on CPU for now", reference training.py:150) — minutes
per epoch of eval. Here the whole 200-step, width-4 search is one jitted
lax.scan on TPU.

Run: python tools/bench_seq2seq.py [--batch 64] [--max-len 200]
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
    parser.add_argument("--max-len", type=int, default=200)
    parser.add_argument("--beam", type=int, default=4)
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
    from tpu_slu.models.slu import Model, Seq2SeqArch, init_seq2seq_params
    from tpu_slu.ops.gru import resolve_gru_impl

    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=False)
    # Flagship seq2seq shape: FSC char vocab ~100 printable + sos/eos
    config.seq2seq = True
    config.Sy_intent = ["<sos>"] + [chr(32 + i) for i in range(95)] + ["<eos>"]
    config.intent_encoder_dim = 128
    config.num_intent_encoder_layers = 1
    config.intent_decoder_dim = 256
    config.num_intent_decoder_layers = 2
    config.intent_decoder_key_dim = 128
    config.intent_decoder_value_dim = 256
    config.seq2seq_max_decode_len = args.max_len

    model = Model(config)
    impl = resolve_gru_impl(config)

    B, T = args.batch, int(args.seconds * 16000)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T), np.float32))

    infer = jax.jit(
        lambda p, x: slu_mod.seq2seq_beam_infer(
            p, model.seq2seq_arch,
            enc.encoder_features(p["pretrained_model"], model.encoder_arch, x, gru_impl=impl),
            args.beam, gru_impl=impl,
        )
    )
    t0 = time.time()
    scores, tokens = infer(model.params, x)
    np.asarray(scores)
    print(f"compile+first: {time.time() - t0:.1f}s tokens={tokens.shape}")

    def run(k):
        t0 = time.time()
        for _ in range(k):
            scores, tokens = infer(model.params, x)
        np.asarray(scores)
        return time.time() - t0

    run(2)
    t1 = min(run(1) for _ in range(3))
    tk = min(run(11) for _ in range(2))
    ms = (tk - t1) / 10 * 1000
    print(
        f"beam decode (U={args.max_len}, width={args.beam}, B={B}): "
        f"{ms:.1f} ms/batch -> {B / ms * 1000:.0f} utt/s, {ms / B:.2f} ms/utt"
    )


if __name__ == "__main__":
    main()
