"""Export a reference-shaped results.csv from a training log.csv.

The reference archives per-run metric tables as
``experiments/timers_and_such/training/type{1,2,3}_results.csv`` with exactly
the log.csv metric columns (``,intent_loss,intent_acc,set``; see
reference experiments/timers_and_such/training/type1_results.csv) — our
log.csv additionally carries throughput/latency columns, so this strips them
back to the reference shape for result archival / cross-comparison.

Run: python tools/export_results.py <log.csv> [<out.csv>]
     (default out: <dir>/type<pretraining_type>_results.csv using the
      experiment.cfg next to the log when present, else results.csv)
"""

import configparser
import os
import sys

import pandas as pd

REFERENCE_COLUMNS = [
    "phone_loss", "phone_acc", "word_loss", "word_acc",
    "intent_loss", "intent_acc", "set",
]


def export_results(log_path: str, out_path: str | None = None) -> str:
    df = pd.read_csv(log_path, index_col=0)
    cols = [c for c in REFERENCE_COLUMNS if c in df.columns]
    if not cols:
        raise ValueError(f"{log_path}: no reference metric columns found")
    if out_path is None:
        folder = os.path.dirname(os.path.abspath(log_path))
        ptype = None
        for cfg_dir in (folder, os.path.dirname(folder)):
            cfg = os.path.join(cfg_dir, "experiment.cfg")
            if os.path.isfile(cfg):
                parser = configparser.ConfigParser()
                parser.read(cfg)
                try:
                    ptype = parser.getint("pretraining", "pretraining_type")
                except configparser.Error:
                    pass
                break
        name = f"type{ptype}_results.csv" if ptype is not None else "results.csv"
        out_path = os.path.join(folder, name)
    df[cols].to_csv(out_path)
    return out_path


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    print(export_results(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None))
