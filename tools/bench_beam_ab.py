"""Same-process A/B: fused Pallas beam kernel vs the XLA scan beam, on TPU.

Hardware parity + timing harness for ``ops/pallas_beam.py`` (the chip and
relay are windowed — variants MUST be interleaved in one process, CLAUDE.md).
Checks token exactness and score closeness on the flagship seq2seq topology
AND on an unaligned topology (key_dim=100 / value_dim=200, the reference's
``all_real_seq2seq.cfg`` shape) that exercises the host-side lane padding,
then reports interleaved two-point-slope timings.

Parity methodology (measured 2026-08-18, tools/confirm_beam_precision.py):
at TPU DEFAULT matmul precision BOTH sides' f32 matmuls run single-pass
bf16 operands (XLA and in-kernel Mosaic dots alike), whose ~1e-3 rounding
resolves near-degenerate random-init beam ties differently per op order —
13.2% token flips on the random-init unaligned case, while the flagship
(realistic encoder distributions) is token-exact. So: the flagship check
compares both sides at DEFAULT (the production configuration), and the
random-init cases (unaligned, blocked long-T) compare both sides traced
under jax.default_matmul_precision("float32"), where parity is exact
(0/6400, |score diff| <= 3e-5). NB the precision context is consulted at
TRACE time — jitted fns must be CALLED inside the block. Timings keep
DEFAULT precision (the production path).

Usage: python tools/bench_beam_ab.py [--batch 16] [--max-len 200] [--trials 3]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np

import __graft_entry__
from tpu_slu.models import encoder as enc
from tpu_slu.models import slu as slu_mod
from tpu_slu.models.slu import Model, Seq2SeqArch, init_seq2seq_params
from tpu_slu.ops.attention import attention_kv
from tpu_slu.ops.beam import beam_search
from tpu_slu.ops.gru import resolve_gru_impl
from tpu_slu.ops.pallas_beam import beam_decode_pallas, beam_pallas_enabled


def scan_beam(dec, arch, keys, values, Bs, W, U):
    state0 = jnp.broadcast_to(dec["initial_state"][None], (Bs,) + dec["initial_state"].shape)

    def step_fn(state, y_prev):
        return slu_mod._decoder_step(dec, arch, (keys, values), state, y_prev, train=False)

    return beam_search(step_fn, state0, Bs, arch.num_labels, U, W)


def slope_ms(fn, args, iters=60):
    fs, _ = fn(*args)
    np.asarray(fs)  # warm
    t0 = time.time()
    r = fn(*args)
    np.asarray(r[0])
    t1 = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r[0])
    tk = time.time() - t0
    return (tk - t1) / (iters - 1) * 1e3


def check(tag, fused_out, scan_out):
    fs, ft = (np.asarray(a) for a in fused_out)
    ss, st = (np.asarray(a) for a in scan_out)
    tok_eq = np.array_equal(ft, st)
    sc_ok = np.allclose(fs, ss, rtol=1e-4, atol=1e-4)
    print(f"{tag}: tokens_equal={tok_eq} ({(ft != st).mean():.4f} mismatch) "
          f"scores_close={sc_ok}", flush=True)
    return tok_eq and sc_ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-len", type=int, default=200)
    ap.add_argument("--beam", type=int, default=4)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--long", action="store_true",
                    help="also check+time the blocked kernel at 640/1024 frames")
    args = ap.parse_args()
    B, U, W = args.batch, args.max_len, args.beam

    print("devices:", jax.devices(), flush=True)

    # ---- flagship topology, through the real encoder -----------------------
    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=False)
    config.seq2seq = True
    config.Sy_intent = ["<sos>"] + [chr(32 + i) for i in range(95)] + ["<eos>"]
    config.intent_encoder_dim = 128
    config.num_intent_encoder_layers = 1
    config.intent_decoder_dim = 256
    config.num_intent_decoder_layers = 2
    config.intent_decoder_key_dim = 128
    config.intent_decoder_value_dim = 256
    config.seq2seq_max_decode_len = U
    model = Model(config)
    impl = resolve_gru_impl(config)
    arch = model.seq2seq_arch
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, 64000), np.float32))
    feats = jax.jit(lambda p, x: enc.encoder_features(
        p["pretrained_model"], model.encoder_arch, x, gru_impl=impl))(model.params, x)
    enc_out = jax.jit(lambda p, f: slu_mod.seq2seq_encode(
        p["encoder"], arch, f, train=False, gru_impl=impl))(model.params, feats)
    dec = model.params["decoder"]
    keys, values = jax.jit(lambda d, e: attention_kv(d["attention"], e))(dec, enc_out)
    print("enc frames:", enc_out.shape[1], "fused enabled:",
          beam_pallas_enabled(arch, B, n_enc_frames=enc_out.shape[1], beam_width=W),
          flush=True)

    fused = jax.jit(lambda d, k, v: beam_decode_pallas(d, arch, k, v, W, U))
    scan = jax.jit(lambda d, k, v: scan_beam(d, arch, k, v, B, W, U))
    ok = check("flagship", fused(dec, keys, values), scan(dec, keys, values))

    # ---- unaligned topology (lane-padding path) ----------------------------
    u_arch = Seq2SeqArch(
        num_labels=98, num_encoder_layers=1, encoder_dim=128,
        num_decoder_layers=2, decoder_dim=256, key_dim=100, value_dim=200,
        sos=0, max_decode_len=100,
    )
    u_dec = init_seq2seq_params(jax.random.PRNGKey(7), u_arch, 256)["decoder"]
    u_enc = jnp.asarray(np.random.default_rng(7).standard_normal((B, 25, 256), np.float32))
    u_k, u_v = jax.jit(lambda d, e: attention_kv(d["attention"], e))(u_dec, u_enc)
    with jax.default_matmul_precision("float32"):
        u_fused_out = jax.jit(
            lambda d, k, v: beam_decode_pallas(d, u_arch, k, v, W, 100)
        )(u_dec, u_k, u_v)
        u_scan_out = jax.jit(
            lambda d, k, v: scan_beam(d, u_arch, k, v, B, W, 100)
        )(u_dec, u_k, u_v)
    ok &= check("unaligned(k100/v200)@f32", u_fused_out, u_scan_out)

    # ---- long inputs: the BLOCKED kernel flavor (round 4) ------------------
    if args.long:
        from tpu_slu.ops.pallas_beam import _fused_mode

        l_arch = Seq2SeqArch(
            num_labels=98, num_encoder_layers=1, encoder_dim=64,
            num_decoder_layers=2, decoder_dim=128, key_dim=64, value_dim=128,
            sos=0, max_decode_len=100,
        )
        l_dec = init_seq2seq_params(jax.random.PRNGKey(9), l_arch, 128)["decoder"]
        Bl = 8
        for T in (640, 1024):
            mode = _fused_mode(l_arch, Bl, T, args.beam)
            l_enc = jnp.asarray(
                np.random.default_rng(T).standard_normal((Bl, T, 128), np.float32)
            )
            l_k, l_v = jax.jit(lambda d, e: attention_kv(d["attention"], e))(l_dec, l_enc)
            l_fused = jax.jit(
                lambda d, k, v: beam_decode_pallas(d, l_arch, k, v, args.beam, 100)
            )
            l_scan = jax.jit(
                lambda d, k, v: scan_beam(d, l_arch, k, v, Bl, args.beam, 100)
            )
            with jax.default_matmul_precision("float32"):
                l_fused_f32_out = jax.jit(
                    lambda d, k, v: beam_decode_pallas(
                        d, l_arch, k, v, args.beam, 100)
                )(l_dec, l_k, l_v)
                l_scan_f32_out = jax.jit(
                    lambda d, k, v: scan_beam(d, l_arch, k, v, Bl, args.beam, 100)
                )(l_dec, l_k, l_v)
            t0 = time.time()
            fo = l_fused(l_dec, l_k, l_v)
            np.asarray(fo[0])
            print(f"T={T} mode={mode} blocked compile+run {time.time() - t0:.1f}s",
                  flush=True)
            ok &= check(f"blocked T={T}@f32", l_fused_f32_out, l_scan_f32_out)
            for trial in range(args.trials):
                f_ms = slope_ms(l_fused, (l_dec, l_k, l_v), iters=30)
                s_ms = slope_ms(l_scan, (l_dec, l_k, l_v), iters=30)
                print(f"T={T} trial {trial}: fused {f_ms:.2f} ms  scan {s_ms:.2f} ms  "
                      f"speedup {s_ms / f_ms:.2f}x", flush=True)

    # ---- interleaved timings ------------------------------------------------
    for trial in range(args.trials):
        f_ms = slope_ms(fused, (dec, keys, values))
        s_ms = slope_ms(scan, (dec, keys, values))
        print(f"trial {trial}: fused {f_ms:.2f} ms  scan {s_ms:.2f} ms  "
              f"speedup {s_ms / f_ms:.2f}x", flush=True)

    print("BEAM AB", "OK" if ok else "PARITY FAILURE", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
