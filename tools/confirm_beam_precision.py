"""Confirm the unaligned-beam 'parity failure' is matmul-precision tie flips.

debug_beam_unaligned.py showed token flips on hardware for ALL random-init
variants (lane-aligned ones included) with |score diff| ~1e-3 — the
signature of DEFAULT TPU matmul precision, where f32 matmuls on BOTH sides
(XLA's and the kernel's Mosaic dots alike) run single-pass bf16 operands
and the two sides round differently per op shape/order, resolving
near-degenerate random-init beam ties differently. Tracing both sides
under jax.default_matmul_precision("float32") (3-pass f32 emulation)
collapses the score diff by ~3 orders of magnitude and eliminates the
flips entirely — measured on v5e 2026-08-18: default 13.2% token
mismatch / 9e-2 max score diff, float32 0.0000 / 3e-5.

Run: python tools/confirm_beam_precision.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np

from tpu_slu.models import slu as slu_mod
from tpu_slu.models.slu import Seq2SeqArch, init_seq2seq_params
from tpu_slu.ops.attention import attention_kv
from tpu_slu.ops.beam import beam_search
from tpu_slu.ops.pallas_beam import beam_decode_pallas


def main():
    B, W, T, U = 16, 4, 25, 100
    arch = Seq2SeqArch(
        num_labels=98, num_encoder_layers=1, encoder_dim=128,
        num_decoder_layers=2, decoder_dim=256, key_dim=100, value_dim=200,
        sos=0, max_decode_len=U,
    )
    dec = init_seq2seq_params(jax.random.PRNGKey(7), arch, 256)["decoder"]
    enc = jnp.asarray(
        np.random.default_rng(7).standard_normal((B, T, 256), np.float32)
    )

    def run_scan(precision):
        with jax.default_matmul_precision(precision):
            k, v = jax.jit(lambda d, e: attention_kv(d["attention"], e))(dec, enc)
            state0 = jnp.broadcast_to(
                dec["initial_state"][None], (B,) + dec["initial_state"].shape
            )

            def step_fn(state, y_prev):
                return slu_mod._decoder_step(
                    dec, arch, (k, v), state, y_prev, train=False
                )

            s, t = jax.jit(
                lambda: beam_search(step_fn, state0, B, arch.num_labels, U, W)
            )()
            return np.asarray(s), np.asarray(t), k, v

    for prec in ("default", "float32"):
        ss, st, k, v = run_scan(prec)
        with jax.default_matmul_precision(prec):
            fs, ft = beam_decode_pallas(dec, arch, k, v, W, U)
        fs, ft = np.asarray(fs), np.asarray(ft)
        print(
            f"scan@{prec}: tok_mismatch={(ft != st).mean():.4f} "
            f"max|score diff|={np.abs(fs - ss).max():.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
