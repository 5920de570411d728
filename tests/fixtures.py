"""Synthetic dataset generators for hermetic end-to-end tests.

Builds tiny FSC-style SLU and LibriSpeech-style ASR datasets whose audio
content *encodes* the labels (slot-dependent sine tones), so short training
runs produce real learning signal without any external data (SURVEY.md §4
test strategy).
"""

import os

import numpy as np

from tpu_slu.data.audio import write_wav
from tpu_slu.data.textgrid import write_textgrid

FS = 16000

ACTIONS = ["activate", "deactivate"]
OBJECTS = ["lights", "music"]
LOCATIONS = ["kitchen", "bedroom"]

# One tone per slot value; frequencies high/far enough apart that even the
# short test-config filters (k=31 @ 16 kHz) resolve them.
_TONES = {
    ("action", "activate"): 600.0,
    ("action", "deactivate"): 1400.0,
    ("object", "lights"): 2200.0,
    ("object", "music"): 3000.0,
    ("location", "kitchen"): 3800.0,
    ("location", "bedroom"): 4600.0,
}


def _intent_wave(action, obj, location, rng, dur_s):
    t = np.arange(int(FS * dur_s)) / FS
    x = (
        np.sin(2 * np.pi * _TONES[("action", action)] * t)
        + np.sin(2 * np.pi * _TONES[("object", obj)] * t)
        + np.sin(2 * np.pi * _TONES[("location", location)] * t)
    )
    x = 0.25 * x + 0.01 * rng.standard_normal(len(t))
    return x.astype(np.float32)


def make_slu_dataset(root: str, n_train=48, n_valid=16, n_test=16, seed=0, seq2seq_too=True):
    """Create an FSC-layout dataset under ``root`` and return the root."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    os.makedirs(os.path.join(root, "wavs"), exist_ok=True)

    def rows(n, split):
        out = []
        for i in range(n):
            a = ACTIONS[rng.integers(len(ACTIONS))]
            o = OBJECTS[rng.integers(len(OBJECTS))]
            l = LOCATIONS[rng.integers(len(LOCATIONS))]
            dur = rng.uniform(0.35, 0.55)
            rel = f"wavs/{split}_{i}.wav"
            write_wav(os.path.join(root, rel), _intent_wave(a, o, l, rng, dur), FS)
            out.append(
                {
                    "path": rel,
                    "speakerId": f"spk{i % 4}",
                    "transcription": f"{a} the {o} in the {l}",
                    "action": a,
                    "object": o,
                    "location": l,
                    "semantics": f"{a[:2]}{o[:2]}{l[:2]}",
                }
            )
        return out

    import pandas as pd

    base_cols = ["path", "speakerId", "transcription", "action", "object", "location"]
    for split, n in (("train", n_train), ("valid", n_valid), ("test", n_test)):
        df = pd.DataFrame(rows(n, split))
        df[base_cols].to_csv(os.path.join(root, "data", f"{split}_data.csv"), index=False)
        if seq2seq_too:
            df[["path", "speakerId", "transcription", "semantics"]].to_csv(
                os.path.join(root, "data", f"{split}_data_seq2seq.csv"), index=False
            )
    empty = pd.DataFrame(columns=base_cols)
    empty.to_csv(os.path.join(root, "data", "synthetic_data.csv"), index=False)
    if seq2seq_too:
        pd.DataFrame(columns=["path", "speakerId", "transcription", "semantics"]).to_csv(
            os.path.join(root, "data", "synthetic_data_seq2seq.csv"), index=False
        )
    return root


PHONES = ["AA", "IY", "K", "T", "sil"]
WORDS = ["cat", "dog", ""]


def make_asr_dataset(root: str, n_per_split=6, seed=0):
    """Create a LibriSpeech-alignment-layout dataset under ``root``."""
    rng = np.random.default_rng(seed)
    for split in ("train-clean-100", "dev-clean", "test-clean"):
        for i in range(n_per_split):
            tg_dir = os.path.join(root, "text", split, "1", "2")
            wav_dir = os.path.join(root, "audio", split, "1", "2")
            os.makedirs(tg_dir, exist_ok=True)
            os.makedirs(wav_dir, exist_ok=True)
            dur = float(rng.uniform(1.0, 2.0))
            n_seg = 4
            bounds = np.linspace(0, dur, n_seg + 1)
            phones = []
            words = []
            x = np.zeros(int(dur * FS), np.float32)
            for s in range(n_seg):
                # Stress-digit suffix on phones exercises the rstrip path
                p = PHONES[rng.integers(len(PHONES))]
                mark = p + ("1" if p not in ("sil",) and rng.random() < 0.5 else "")
                phones.append((float(bounds[s]), float(bounds[s + 1]), mark))
                words.append(
                    (float(bounds[s]), float(bounds[s + 1]), WORDS[rng.integers(len(WORDS))])
                )
                freq = 200.0 + 150.0 * PHONES.index(p)
                seg = slice(int(bounds[s] * FS), int(bounds[s + 1] * FS))
                t = np.arange(seg.stop - seg.start) / FS
                x[seg] = 0.3 * np.sin(2 * np.pi * freq * t)
            write_textgrid(
                os.path.join(tg_dir, f"utt{i}.TextGrid"),
                {"words": words, "phones": phones},
                dur,
            )
            write_wav(os.path.join(wav_dir, f"utt{i}.wav"), x, FS)
    return root


CFG_TEMPLATE = """[experiment]
seed=7
folder={folder}

[phoneme_module]
use_sincnet={use_sincnet}
fs=16000

cnn_N_filt=16,16
cnn_len_filt=31,3
cnn_stride=10,1
cnn_max_pool_len=2,1
cnn_act=leaky_relu,leaky_relu
cnn_drop=0.0,0.0

phone_rnn_num_hidden=12,12
phone_downsample_len=2,2
phone_downsample_type=avg,avg
phone_rnn_drop=0.0,0.0
phone_rnn_bidirectional=True

[word_module]
word_rnn_num_hidden=12,12
word_downsample_len=2,2
word_downsample_type=avg,avg
word_rnn_drop=0.0,0.0
word_rnn_bidirectional=True
vocabulary_size=8

[intent_module]
intent_rnn_num_hidden=16
intent_downsample_len=1
intent_downsample_type=none
intent_rnn_drop=0.0
intent_rnn_bidirectional=True
intent_encoder_dim=8
num_intent_encoder_layers=1
intent_decoder_dim=8
num_intent_decoder_layers=1
intent_decoder_key_dim=8
intent_decoder_value_dim=8

[pretraining]
asr_path={asr_path}
pretraining_type={pretraining_type}
pretraining_lr=0.003
pretraining_batch_size=8
pretraining_num_epochs=2
pretraining_length_mean=1.0
pretraining_length_var=0.2

[training]
slu_path={slu_path}
unfreezing_type={unfreezing_type}
training_lr=0.003
training_batch_size=8
training_num_epochs=4
real_dataset_subset_percentage=1.0
synthetic_dataset_subset_percentage=1.0
real_speaker_subset_percentage=1.0
synthetic_speaker_subset_percentage=1.0
train_wording_path=None
test_wording_path=None
seq2seq={seq2seq}
"""


def write_cfg(
    path,
    folder,
    slu_path="",
    asr_path="",
    pretraining_type=0,
    unfreezing_type=0,
    seq2seq=False,
    use_sincnet=True,
    extra: str = "",
    replace: dict | None = None,
):
    """Write a test cfg. ``extra`` appends lines to [training]; ``replace``
    maps literal template substrings to replacements (e.g. to change lr)."""
    cfg = CFG_TEMPLATE.format(
        folder=folder,
        slu_path=slu_path,
        asr_path=asr_path,
        pretraining_type=pretraining_type,
        unfreezing_type=unfreezing_type,
        seq2seq=seq2seq,
        use_sincnet=use_sincnet,
    )
    for old, new in (replace or {}).items():
        assert old in cfg, f"template does not contain {old!r}"
        cfg = cfg.replace(old, new)
    with open(path, "w") as f:
        f.write(cfg + extra)
    return path


def write_phonemes_txt(folder, phones=PHONES):
    os.makedirs(os.path.join(folder, "pretraining"), exist_ok=True)
    with open(os.path.join(folder, "pretraining", "phonemes.txt"), "w") as f:
        f.writelines(p + "\n" for p in phones)
