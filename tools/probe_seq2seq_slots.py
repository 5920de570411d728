"""Slot-wise error analysis of a trained seq2seq demo checkpoint.

Decodes held-out wavs with the dataset-free serving path and reports
per-slot error counts on the synthetic ``a|o|l`` semantics format
(tools/train_synthetic.py make_dataset). This probe is what isolated the
round-5 seq2seq findings: checkpoints whose training loss kept improving
decoded the FIRST slot as one constant value (56/64, then 51/64 wrong
actions) while later slots approached perfect accuracy — the signature of
the reference's train(one-hot SOS)/decode(zeros) first-step mismatch
(reference models.py:536-538 vs models.py:600; see config extension
seq2seq_zeros_start).

Usage: python tools/probe_seq2seq_slots.py [--workdir /tmp/tpu_slu_s2s]
         [--split valid] [--n 64]
"""

import argparse
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/tpu_slu_synth")
    parser.add_argument("--split", default="valid", choices=["valid", "test"])
    parser.add_argument("--n", type=int, default=64)
    parser.add_argument("--show", type=int, default=12,
                        help="example decodes to print")
    args = parser.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )

    import pandas as pd

    from tpu_slu import read_config
    from tpu_slu.data.audio import read_wav
    from tpu_slu.serving import load_trained_model

    config = read_config(os.path.join(args.workdir, "s2s_exp.cfg"))
    config.seq2seq_max_decode_len = 32
    model = load_trained_model(config)

    df = pd.read_csv(os.path.join(
        args.workdir, "fsc_synth", "data", f"{args.split}_data_seq2seq.csv"))
    slot_err: Counter = Counter()
    exact = 0
    n = min(args.n, len(df))
    for i in range(n):
        row = df.iloc[i]
        wav, _ = read_wav(os.path.join(args.workdir, "fsc_synth", row["path"]))
        dec = model.decode_intents(wav[None, :])[0]
        truth = row["semantics"]
        exact += dec == truth
        dparts, tparts = dec.split("|"), truth.split("|")
        for k, name in enumerate(("action", "object", "location")):
            if k >= len(dparts) or dparts[k] != tparts[k]:
                slot_err[name] += 1
        if len(dparts) != 3:
            slot_err["structure"] += 1
        if i < args.show:
            print(f"  truth={truth!r:12} decoded={dec!r}")
    print(f"exact {exact}/{n}")
    print("slot errors:", dict(slot_err))


if __name__ == "__main__":
    main()
