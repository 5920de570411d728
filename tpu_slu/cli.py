"""CLI experiment driver (reference-compatible), packaged as ``tpu-slu``.

Usage (same flags as the reference ``main.py:9-14``):

    tpu-slu --pretrain --config_path=experiments/no_unfreezing.cfg
    tpu-slu --train   --config_path=experiments/no_unfreezing.cfg
    tpu-slu --train --restart --config_path=...
    tpu-slu --decode --wav=test.wav --config_path=...

``--pretrain`` runs LibriSpeech ASR pre-training; ``--train`` runs SLU
training; ``--restart`` resumes from the phase checkpoint; ``--decode`` is
a dataset-free inference extension (the reference has no decode CLI — its
README recipe is a Python snippet, reference ``README.md:26-41``).

The repo-root ``main.py`` is a thin shim over this module so the
reference's ``python main.py ...`` invocation keeps working from a source
checkout, while ``pip install tpu-slu`` exposes the same driver as a
console script.
"""

import argparse

import numpy as np

from tpu_slu import read_config
from tpu_slu.data.datasets import get_ASR_datasets, get_SLU_datasets
from tpu_slu.models import Model, PretrainedModel
from tpu_slu.training.trainer import Trainer


def main():
    parser = argparse.ArgumentParser(prog="tpu-slu")
    parser.add_argument("--pretrain", action="store_true", help="run ASR pre-training")
    parser.add_argument("--train", action="store_true", help="run SLU training")
    parser.add_argument(
        "--restart", action="store_true", help="load checkpoint from a previous run"
    )
    parser.add_argument(
        "--decode", action="store_true",
        help="decode intents for --wav using the trained SLU checkpoint",
    )
    parser.add_argument("--wav", type=str, help="wav file for --decode")
    parser.add_argument(
        "--config_path", type=str, required=True,
        help="path to config file with hyperparameters, etc.",
    )
    args = parser.parse_args()

    config = read_config(args.config_path)
    np.random.seed(config.seed)

    if args.pretrain:
        train_dataset, valid_dataset, test_dataset = get_ASR_datasets(config)
        pretrained_model = PretrainedModel(config)
        trainer = Trainer(model=pretrained_model, config=config)
        if args.restart:
            trainer.load_checkpoint()

        for epoch in range(config.pretraining_num_epochs):
            print(f"========= Epoch {epoch + 1} of {config.pretraining_num_epochs} =========")
            tpa, tpl, twa, twl = trainer.train(train_dataset)
            vpa, vpl, vwa, vwl = trainer.test(valid_dataset)

            print(f"========= Results: epoch {epoch + 1} of {config.pretraining_num_epochs} =========")
            print(f"*phonemes*| train accuracy: {tpa:.2f}| train loss: {tpl:.2f}| valid accuracy: {vpa:.2f}| valid loss: {vpl:.2f}\n")
            print(f"*words*| train accuracy: {twa:.2f}| train loss: {twl:.2f}| valid accuracy: {vwa:.2f}| valid loss: {vwl:.2f}\n")

            trainer.save_checkpoint()

    if args.train:
        train_dataset, valid_dataset, test_dataset = get_SLU_datasets(config)
        model = Model(config)
        trainer = Trainer(model=model, config=config)
        if args.restart:
            trainer.load_checkpoint()

        for epoch in range(config.training_num_epochs):
            print(f"========= Epoch {epoch + 1} of {config.training_num_epochs} =========")
            tia, til = trainer.train(train_dataset)
            via, vil = trainer.test(valid_dataset)

            print(f"========= Results: epoch {epoch + 1} of {config.training_num_epochs} =========")
            print(f"*intents*| train accuracy: {tia:.2f}| train loss: {til:.2f}| valid accuracy: {via:.2f}| valid loss: {vil:.2f}\n")

            trainer.save_checkpoint()

        test_ia, test_il = trainer.test(test_dataset, log_set="test")
        print("========= Test results =========")
        print(f"*intents*| test accuracy: {test_ia:.2f}| test loss: {test_il:.2f}\n")

    if args.decode:
        # Dataset-free inference: vocab.json (written at training time)
        # replaces the reference's get_SLU_datasets side-effect requirement;
        # falls back to the dataset when only legacy artifacts exist.
        from tpu_slu.data.audio import read_wav
        from tpu_slu.serving import load_trained_model

        if not args.wav:
            parser.error("--decode requires --wav")
        model = load_trained_model(config)
        signal, fs = read_wav(args.wav)
        intents = model.decode_intents(signal[None, :])
        print(intents[0])


if __name__ == "__main__":
    main()
