"""Generate the experiments/*.cfg suite.

Covers the reference's experiment space (SURVEY.md §2 row 15): unfreezing
types 0/1/2, pretraining types 0/1/2/3, dataset/speaker subsets, limited
wordings, seq2seq variants (FSC / Snips / Timers-and-Such), augmentation,
and dataset upsampling — using the same INI key schema so cfgs are
interchangeable with the reference's loader.

Run: python tools/gen_experiments.py  (idempotent; writes experiments/)
"""

import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXP = os.path.join(ROOT, "experiments")

BASE = """[experiment]
seed={seed}
folder=experiments/{name}

[phoneme_module]
use_sincnet=True
fs=16000

cnn_N_filt=80,60,60
cnn_len_filt=401,5,5
cnn_stride=80,1,1
cnn_max_pool_len=2,1,1
cnn_act=leaky_relu,leaky_relu,leaky_relu
cnn_drop=0.0,0.0,0.0

phone_rnn_num_hidden=128,128
phone_downsample_len=2,2
phone_downsample_type=avg,avg
phone_rnn_drop={rnn_drop},{rnn_drop}
phone_rnn_bidirectional=True

[word_module]
word_rnn_num_hidden=128,128
word_downsample_len=2,2
word_downsample_type=avg,avg
word_rnn_drop={rnn_drop},{rnn_drop}
word_rnn_bidirectional=True
vocabulary_size=10000

[intent_module]
intent_rnn_num_hidden=128
intent_downsample_len=1
intent_downsample_type=none
intent_rnn_drop={rnn_drop}
intent_rnn_bidirectional=True
{seq2seq_hparams}
[pretraining]
asr_path={asr_path}
pretraining_type={pretraining_type}
; 0 = none, 1 = phoneme, 2 = phoneme + word, 3 = word
pretraining_lr=0.001
pretraining_batch_size=64
pretraining_num_epochs=10
pretraining_length_mean=2.25
pretraining_length_var=1

[training]
slu_path={slu_path}
unfreezing_type={unfreezing_type}
; 0 = none, 1 = unfreeze word layers, 2 = word + phoneme layers
training_lr={training_lr}
training_batch_size={batch}
training_num_epochs={epochs}
real_dataset_subset_percentage={real_subset}
synthetic_dataset_subset_percentage={synth_subset}
real_speaker_subset_percentage={real_speakers}
synthetic_speaker_subset_percentage={synth_speakers}
train_wording_path={train_wordings}
test_wording_path={test_wordings}
{extra}"""

def s2s_hparams(enc_dim=128, enc_layers=1, dec_dim=256, dec_layers=2, key=100, value=200):
    """Seq2seq head hparams. Defaults mirror the reference's working seq2seq
    cfgs (rssl/snips, reference experiments/rssl_all_real.cfg:26-31); the
    bundled all_real_seq2seq.cfg writes ``intent_decoder_dim=256,256`` and
    omits the layer counts, which int() rejects so the reference silently
    prints "no seq2seq hyperparameters" and then crashes building the Model —
    we ship the intended two-layer 256 equivalent instead."""
    return (
        f"intent_encoder_dim={enc_dim}\n"
        f"num_intent_encoder_layers={enc_layers}\n"
        f"intent_decoder_dim={dec_dim}\n"
        f"num_intent_decoder_layers={dec_layers}\n"
        f"intent_decoder_key_dim={key}\n"
        f"intent_decoder_value_dim={value}\n"
    )


SEQ2SEQ_HPARAMS = s2s_hparams()

FSC = "data/fluent_speech_commands_dataset"
SNIPS = "data/snips_slu_dataset/smart-lights-en-close-field"
TIMERS = "data/timers_and_such"
RSSL = "data/rssl_recordings"
LIBRI = "data/librispeech"


def cfg(name, **kw):
    args = dict(
        name=name,
        seed=1234,
        asr_path=LIBRI,
        slu_path=FSC,
        pretraining_type=2,
        unfreezing_type=0,
        training_lr=0.001,
        epochs=20,
        batch=64,
        rnn_drop=0.5,
        real_subset=1.0,
        synth_subset=1.0,
        real_speakers=1.0,
        synth_speakers=0.0,
        train_wordings="None",
        test_wordings="None",
        seq2seq_hparams="",
        extra="",
    )
    args.update(kw)
    return BASE.format(**args)


WORDINGS = dict(
    train_wordings="experiments/train_wordings.txt",
    test_wordings="experiments/test_wordings.txt",
)

# Name-for-name mirror of the reference's experiments/*.cfg catalog
# (settings transcribed from each file's diff vs no_unfreezing.cfg). The 9
# legacy-key cfgs (dataset_subset_percentage; they crash the reference's own
# read_config, SURVEY.md SS2 row 15) are shipped *modernized* — same names and
# intended semantics with the current subset keys; fail-parity on the
# original files is pinned by tests/test_reference_cfgs.py. Other documented
# deviations: all_real_seq2seq gets working seq2seq hparams (see s2s_hparams),
# and the folder= always matches the cfg name (the reference's
# some_real_no_synth_augment.cfg and test.cfg point their folders at *other*
# experiments and would overwrite them).
REF_MIRROR = {
    # -- FSC fixed-intent ladder: pretraining x unfreezing -----------------
    "no_unfreezing": cfg("no_unfreezing"),
    "unfreeze_word_layers": cfg("unfreeze_word_layers", unfreezing_type=1),
    "unfreeze_all_layers": cfg("unfreeze_all_layers", unfreezing_type=2),
    "words_only": cfg("words_only", pretraining_type=3, unfreezing_type=1),
    "no_pretraining": cfg("no_pretraining", pretraining_type=0, unfreezing_type=2),
    # -- 10% data subsets ---------------------------------------------------
    "no_unfreezing_subset": cfg("no_unfreezing_subset", epochs=100, real_subset=0.1),
    "no_pretraining_subset": cfg(
        "no_pretraining_subset", pretraining_type=0, unfreezing_type=2,
        epochs=100, real_subset=0.1,
    ),
    "unfreeze_all_layers_subset": cfg(
        "unfreeze_all_layers_subset", unfreezing_type=2, epochs=100, real_subset=0.1
    ),
    "unfreeze_word_layers_subset": cfg(
        "unfreeze_word_layers_subset", unfreezing_type=1, epochs=100,
        synth_subset=0.0, real_speakers=0.28, synth_speakers=1.0,
    ),
    # -- limited-wordings generalization ------------------------------------
    "no_unfreezing_limited_wordings": cfg(
        "no_unfreezing_limited_wordings", training_lr=0.00001, epochs=100, **WORDINGS
    ),
    "no_pretraining_limited_wordings": cfg(
        "no_pretraining_limited_wordings", pretraining_type=0, unfreezing_type=2,
        training_lr=0.00001, epochs=100, rnn_drop=0.0, **WORDINGS,
    ),
    "unfreeze_word_layers_limited_wordings": cfg(
        "unfreeze_word_layers_limited_wordings", unfreezing_type=1, epochs=100,
        **WORDINGS,
    ),
    # -- real/synthetic speaker mixes ---------------------------------------
    "22_real_speakers": cfg(
        "22_real_speakers", unfreezing_type=1, synth_subset=0.0,
        real_speakers=0.28, synth_speakers=1.0,
    ),
    "22_synthetic_speakers": cfg(
        "22_synthetic_speakers", unfreezing_type=1, real_subset=0.0, synth_speakers=1.0
    ),
    "all_real": cfg(
        "all_real", seed=4, unfreezing_type=1, synth_subset=0.0, synth_speakers=1.0
    ),
    "all_real_all_synth": cfg(
        "all_real_all_synth", seed=4, unfreezing_type=1, synth_speakers=1.0
    ),
    "all_synth": cfg(
        "all_synth", seed=4, unfreezing_type=1, real_subset=0.0, synth_speakers=1.0
    ),
    "some_real_all_synth": cfg(
        "some_real_all_synth", seed=2076, unfreezing_type=1,
        real_speakers=0.987012987012987, synth_speakers=1.0,
    ),
    "some_real_no_synth": cfg(
        "some_real_no_synth", seed=2076, unfreezing_type=1, synth_subset=0.0,
        real_speakers=0.987012987012987, synth_speakers=1.0,
    ),
    "some_real_no_synth_augment": cfg(
        "some_real_no_synth_augment", seed=1038, unfreezing_type=1, synth_subset=0.0,
        real_speakers=0.4935064935064935, synth_speakers=1.0, extra="augment=True\n",
    ),
    "some_synth_amount": cfg(
        "some_synth_amount", seed=4022, unfreezing_type=1,
        real_speakers=0.0, synth_speakers=1.0,
    ),
    "some_synth_no_real": cfg(
        "some_synth_no_real", seed=4022, unfreezing_type=1,
        real_speakers=0.0, synth_speakers=1.0,
    ),
    "some_synth_no_real_augment": cfg(
        "some_synth_no_real_augment", seed=0, unfreezing_type=1, epochs=100,
        real_speakers=0.0, synth_speakers=1.0, extra="augment=True\n",
    ),
    # -- seq2seq variants -----------------------------------------------------
    "all_real_seq2seq": cfg(
        "all_real_seq2seq", seed=4, unfreezing_type=1, synth_subset=0.0,
        synth_speakers=1.0, seq2seq_hparams=SEQ2SEQ_HPARAMS, extra="seq2seq=True\n",
    ),
    "rssl_all_real": cfg(
        "rssl_all_real", seed=0, slu_path=RSSL, unfreezing_type=1,
        training_lr=0.0001, epochs=40, synth_subset=0.0, synth_speakers=1.0,
        seq2seq_hparams=SEQ2SEQ_HPARAMS,
        extra="seq2seq=True\ndataset_upsample_factor=100\n",
    ),
    "snips_no_synth": cfg(
        "snips_no_synth", seed=0, slu_path=SNIPS, unfreezing_type=1,
        training_lr=0.0001, epochs=40, synth_subset=0.0, synth_speakers=1.0,
        seq2seq_hparams=SEQ2SEQ_HPARAMS,
        extra="seq2seq=True\ndataset_upsample_factor=23\n",
    ),
    "snips_synth": cfg(
        "snips_synth", seed=0, slu_path=SNIPS, unfreezing_type=1,
        training_lr=0.0001, epochs=40, synth_speakers=1.0,
        seq2seq_hparams=SEQ2SEQ_HPARAMS, extra="seq2seq=True\n",
    ),
    "test": cfg(
        "test", seed=4, slu_path=SNIPS, unfreezing_type=1,
        training_lr=0.0001, epochs=40, synth_speakers=1.0,
        seq2seq_hparams=SEQ2SEQ_HPARAMS, extra="seq2seq=True\n",
    ),
    "timers_and_such": cfg(
        "timers_and_such", seed=0, slu_path=TIMERS, unfreezing_type=1,
        training_lr=0.0001, batch=128, epochs=15, synth_subset=0.0,
        synth_speakers=1.0,
        seq2seq_hparams=s2s_hparams(dec_dim=512, dec_layers=3, key=256, value=512),
        extra="seq2seq=True\ndataset_upsample_factor=1\n",
    ),
}

# Extensions beyond the reference catalog (additional useful axes).
EXTENSIONS = {
    "phonemes_only": cfg("phonemes_only", pretraining_type=1, unfreezing_type=1),
    "half_speakers": cfg("half_speakers", unfreezing_type=1, real_speakers=0.5),
    "synthetic_only": cfg(
        "synthetic_only", real_subset=0.0, synth_speakers=1.0, unfreezing_type=1
    ),
    "augment": cfg("augment", unfreezing_type=1, extra="augment=True\n"),
    "snips_seq2seq": cfg(
        "snips_seq2seq", slu_path=SNIPS, seq2seq_hparams=SEQ2SEQ_HPARAMS,
        extra="seq2seq=True\ndataset_upsample_factor=23\n",
        epochs=100, training_lr=0.0001,
    ),
}

EXPERIMENTS = {**REF_MIRROR, **EXTENSIONS}

# FSC phrases for the limited-wordings study (per-intent single wording held
# out at train time; unseen wordings at test time probe generalization).
TRAIN_WORDINGS = [
    "turn on the lights",
    "turn off the lights",
    "turn the lights on in the kitchen",
    "turn up the heat",
    "turn down the heat",
    "play the music",
    "pause the music",
    "turn up the volume",
    "turn down the volume",
]
TEST_WORDINGS = [
    "switch on the lights",
    "switch off the lights",
    "lights on in the kitchen please",
    "make it warmer",
    "make it cooler",
    "start the music",
    "stop the music",
    "louder please",
    "quieter please",
]


def main():
    os.makedirs(EXP, exist_ok=True)
    for name, text in EXPERIMENTS.items():
        with open(os.path.join(EXP, f"{name}.cfg"), "w") as f:
            f.write(text)
    with open(os.path.join(EXP, "train_wordings.txt"), "w") as f:
        f.writelines(w + "\n" for w in TRAIN_WORDINGS)
    with open(os.path.join(EXP, "test_wordings.txt"), "w") as f:
        f.writelines(w + "\n" for w in TEST_WORDINGS)
    print(f"wrote {len(EXPERIMENTS)} cfgs to {EXP}")


if __name__ == "__main__":
    main()
