"""Config parsing parity: keys, derived fields, optional fallbacks, side effects."""

import os

import pytest

from tpu_slu import read_config
from tests import fixtures


@pytest.fixture
def cfg_path(tmp_path):
    return fixtures.write_cfg(
        str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"),
        slu_path="/slu", asr_path="/asr", pretraining_type=2, unfreezing_type=1,
    )


def test_basic_keys(cfg_path, tmp_path):
    config = read_config(cfg_path)
    assert config.seed == 7
    assert config.use_sincnet is True
    assert config.fs == 16000
    assert config.cnn_N_filt == [16, 16]
    assert config.cnn_stride == [10, 1]
    assert config.phone_rnn_num_hidden == [12, 12]
    assert config.word_rnn_bidirectional is True
    assert config.vocabulary_size == 8
    assert config.training_batch_size == 8
    assert config.train_wording_path is None
    assert config.seq2seq is False
    assert config.dataset_upsample_factor == 1  # optional-key default
    assert config.augment is False


def test_derived_downsample_factors(cfg_path):
    config = read_config(cfg_path)
    # strides 10*1 * pools 2*1 * phone_ds 2*2 = 80
    assert config.phone_downsample_factor == 80
    # * word_ds 2*2 = 320
    assert config.word_downsample_factor == 320


def test_reference_default_cfg_factors(tmp_path):
    """The canonical no_unfreezing topology: 640 / 2560 (25 Hz / 6.25 Hz)."""
    path = fixtures.write_cfg(str(tmp_path / "c.cfg"), folder=str(tmp_path / "f"))
    text = open(path).read()
    text = (
        text.replace("cnn_N_filt=16,16", "cnn_N_filt=80,60,60")
        .replace("cnn_len_filt=31,3", "cnn_len_filt=401,5,5")
        .replace("cnn_stride=10,1", "cnn_stride=80,1,1")
        .replace("cnn_max_pool_len=2,1", "cnn_max_pool_len=2,1,1")
        .replace("cnn_act=leaky_relu,leaky_relu", "cnn_act=leaky_relu,leaky_relu,leaky_relu")
        .replace("cnn_drop=0.0,0.0", "cnn_drop=0.0,0.0,0.0")
    )
    open(path, "w").write(text)
    config = read_config(path)
    assert config.phone_downsample_factor == 640
    assert config.word_downsample_factor == 2560


@pytest.mark.parametrize(
    "ptype,expected",
    [(0, 1 + 2 + 2 + 2), (1, 1 + 2), (2, 1), (3, 1)],
)
def test_starting_unfreezing_index(tmp_path, ptype, expected):
    path = fixtures.write_cfg(
        str(tmp_path / "c.cfg"), folder=str(tmp_path / "f"), pretraining_type=ptype
    )
    assert read_config(path).starting_unfreezing_index == expected


def test_folder_side_effects(cfg_path, tmp_path):
    read_config(cfg_path)
    folder = tmp_path / "exp"
    assert (folder / "pretraining").is_dir()
    assert (folder / "training").is_dir()
    assert (folder / "experiment.cfg").is_file()


def test_optional_seq2seq_keys_absent(tmp_path):
    path = fixtures.write_cfg(str(tmp_path / "c.cfg"), folder=str(tmp_path / "f"))
    text = "\n".join(
        line
        for line in open(path).read().splitlines()
        if not line.startswith(("intent_encoder_dim", "num_intent_encoder", "intent_decoder", "num_intent_decoder"))
    )
    open(path, "w").write(text)
    config = read_config(path)
    assert not hasattr(config, "intent_encoder_dim")


def test_require_explains_call_order(cfg_path):
    config = read_config(cfg_path)
    with pytest.raises(RuntimeError, match="get_SLU_datasets"):
        config.require("Sy_intent")


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_config(str(tmp_path / "nope.cfg"))


def test_ablation_cfg_writer(tmp_path):
    """tools/train_synthetic._write_cfg emits parseable flagship-topology
    cfgs for the ablation runners (--transfer/--wordings/--types): the
    pretraining/unfreezing types land, and wording-filter paths are wired
    when given (ref data.py:211-223)."""
    import argparse
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import train_synthetic as ts

    args = argparse.Namespace(workdir=str(tmp_path), epochs=2)
    wp = (str(tmp_path / "train_w.txt"), str(tmp_path / "test_w.txt"))
    folder = str(tmp_path / "exp")
    path = ts._write_cfg(args, str(tmp_path / "asr"), str(tmp_path / "slu"),
                         "t3", folder, 3, 1, wording_paths=wp)
    config = read_config(path)
    assert config.pretraining_type == 3
    assert config.unfreezing_type == 1
    assert config.asr_path == str(tmp_path / "asr")
    assert config.train_wording_path == wp[0]
    assert config.test_wording_path == wp[1]
    # type 3 starts the ULMFiT walk inside the word stack (ref data.py:79-82)
    assert config.starting_unfreezing_index == 1


def test_seq2seq_demo_cfg_text(tmp_path):
    """tools/train_synthetic._demo_cfg_text pins the seq2seq demo recipe:
    --from-pretrained yields the reference's actual seq2seq setting
    (pretrained encoder + ULMFiT, ref main.py:24-69) with the two r5
    convergence levers (seq2seq_dropout, seq2seq_zeros_start) and the
    --dims head width; without it, the scratch variant keeps
    pretraining/unfreezing off."""
    import argparse
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import train_synthetic as ts

    def cfg_for(**kw):
        base = dict(workdir=str(tmp_path), epochs=2, seq2seq=True,
                    from_pretrained=False, dims=64, lr=0.0)
        base.update(kw)
        args = argparse.Namespace(**base)
        path = tmp_path / "s2s.cfg"
        path.write_text(ts._demo_cfg_text(args, str(tmp_path / "slu"),
                                          str(tmp_path / "exp")))
        return read_config(str(path))

    config = cfg_for(from_pretrained=True, dims=96, lr=3e-4)
    assert config.seq2seq is True
    assert config.pretraining_type == 2
    assert config.unfreezing_type == 1
    assert config.asr_path == os.path.join(str(tmp_path), "libri_synth")
    assert config.seq2seq_dropout == 0.1
    assert config.seq2seq_zeros_start is True
    assert config.intent_decoder_dim == 96
    assert config.intent_decoder_key_dim == 96
    assert config.training_lr == 3e-4
    assert config.training_batch_size == 32

    scratch = cfg_for()
    assert scratch.pretraining_type == 0
    assert scratch.unfreezing_type == 0
    assert scratch.intent_decoder_dim == 64
    assert scratch.phone_rnn_drop == [0.0, 0.0]
