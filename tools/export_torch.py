"""Export a trained native checkpoint to a reference-loadable .pth.

The reverse interop path: train with this framework on TPU, then deploy the
weights in the original PyTorch implementation (verified byte-for-byte
prediction parity in tests/test_reference_parity.py).

Run: python tools/export_torch.py --config_path exp.cfg --out model_state.pth
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--out", required=True, help="output .pth path")
    parser.add_argument(
        "--phase", choices=["training", "pretraining"], default="training",
        help="which phase checkpoint to export",
    )
    args = parser.parse_args()

    import torch

    from tpu_slu import read_config
    from tpu_slu.models import Model, PretrainedModel
    from tpu_slu.models.torch_import import (
        export_model_state_dict,
        export_pretrained_state_dict,
    )

    config = read_config(args.config_path)
    ckpt_dir = os.path.join(config.folder, args.phase)
    npz = os.path.join(ckpt_dir, "model_state.npz")
    if not os.path.isfile(npz):
        raise FileNotFoundError(f"no native checkpoint at {npz}")

    if args.phase == "pretraining":
        config.num_phonemes = getattr(config, "num_phonemes", 42)
        model = PretrainedModel(config)
        from tpu_slu.training import checkpoint as ckpt

        model.params = ckpt.load_pytree(npz, model.params)
        state = export_pretrained_state_dict(model.params, model.arch)
    else:
        vocab_path = os.path.join(ckpt_dir, "vocab.json")
        with open(vocab_path) as f:
            Model.attach_vocab(config, json.load(f))
        model = Model(config, load_pretrained=False)
        model.load_native_checkpoint(npz)
        state = export_model_state_dict(
            model.params, model.encoder_arch,
            intent_arch=None if model.seq2seq else model.intent_arch,
            seq2seq_arch=model.seq2seq_arch if model.seq2seq else None,
        )
    torch.save(state, args.out)
    print(f"exported {len(state)} tensors to {args.out}")


if __name__ == "__main__":
    main()
