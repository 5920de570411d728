"""Bisect the unaligned (k100/v200) fused-beam hardware parity failure.

bench_beam_ab.py measured (2026-08-18, TPU v5e) a 13% token mismatch
between the fused kernel and the XLA scan for the reference's
``all_real_seq2seq.cfg`` projection widths (key_dim=100, value_dim=200)
while the lane-aligned flagship topology is token-exact. Interpret mode
(CPU) passes for both. This script isolates, ON HARDWARE:

* which padded dimension triggers it (Kd=100 vs Vd=200 vs vocab=98),
* the decode step where the searches first diverge (max_len sweep), and
* whether the pre-divergence score gap is float noise (tie flip) or
  structural (real kernel bug).

Run: python tools/debug_beam_unaligned.py
"""

import os
import sys
import time

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


def scan_beam(dec, arch, keys, values, Bs, W, U):
    state0 = jnp.broadcast_to(
        dec["initial_state"][None], (Bs,) + dec["initial_state"].shape
    )

    def step_fn(state, y_prev):
        return slu_mod._decoder_step(
            dec, arch, (keys, values), state, y_prev, train=False
        )

    return beam_search(step_fn, state0, Bs, arch.num_labels, U, W)


def variant(tag, Kd, Vd, L, B=16, W=4, T=25, H=256, enc_dim=256):
    arch = Seq2SeqArch(
        num_labels=L, num_encoder_layers=1, encoder_dim=enc_dim // 2,
        num_decoder_layers=2, decoder_dim=H, key_dim=Kd, value_dim=Vd,
        sos=0, max_decode_len=100,
    )
    dec = init_seq2seq_params(jax.random.PRNGKey(7), arch, enc_dim)["decoder"]
    enc = jnp.asarray(
        np.random.default_rng(7).standard_normal((B, T, enc_dim), np.float32)
    )
    k, v = jax.jit(lambda d, e: attention_kv(d["attention"], e))(dec, enc)

    print(f"--- {tag}: Kd={Kd} Vd={Vd} L={L} ---", flush=True)
    prev_mismatch = 0.0
    for U in (1, 2, 3, 5, 10, 30, 100):
        t0 = time.time()
        fs, ft = beam_decode_pallas(dec, arch, k, v, W, U)
        ss, st = jax.jit(
            lambda d, k, v, U=U: scan_beam(d, arch, k, v, B, W, U)
        )(dec, k, v)
        fs, ft, ss, st = (np.asarray(a) for a in (fs, ft, ss, st))
        sd = np.abs(fs - ss)
        tm = (ft != st).mean()
        # per-batch-element first divergence step (beam 0 history)
        div = [
            int(np.argmax(ft[0, b] != st[0, b])) if (ft[0, b] != st[0, b]).any()
            else -1
            for b in range(ft.shape[1])
        ]
        print(
            f"U={U:3d}: tok_mismatch={tm:.4f} max|score diff|={sd.max():.3e} "
            f"mean={sd.mean():.3e} first_div_steps={div} "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )
        if tm > 0 and prev_mismatch == 0:
            # at the first U where tokens diverge, show the beam scores of
            # the first diverging batch element from both sides
            b = next(i for i, d in enumerate(div) if d >= 0) if any(
                d >= 0 for d in div
            ) else int(np.argmax((ft != st).any(axis=(0, 2))))
            print(f"  batch {b}: fused scores {fs[:, b]}", flush=True)
            print(f"  batch {b}: scan  scores {ss[:, b]}", flush=True)
            print(f"  batch {b}: fused toks {ft[:, b, :min(U,12)].tolist()}", flush=True)
            print(f"  batch {b}: scan  toks {st[:, b, :min(U,12)].tolist()}", flush=True)
        prev_mismatch = tm
    print(flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    variant("repro k100/v200/L98", 100, 200, 98)
    variant("iso-K k100/v256/L98", 100, 256, 98)
    variant("iso-V k128/v200/L98", 128, 200, 98)
    variant("iso-L k128/v256/L98", 128, 256, 98)
    variant("aligned k128/v256/L97", 128, 256, 97)


if __name__ == "__main__":
    main()
