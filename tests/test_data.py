"""Data layer: WAV codec, TextGrid parser, dataset construction, batching."""

import os

import numpy as np
import pytest

from tests import fixtures
from tpu_slu import read_config
from tpu_slu.data.audio import read_wav, write_wav
from tpu_slu.data.datasets import get_ASR_datasets, get_SLU_datasets
from tpu_slu.data.loader import BatchLoader, pad_to_bucket
from tpu_slu.data.textgrid import read_textgrid, write_textgrid


class TestAudio:
    def test_wav_roundtrip(self, tmp_path, rng):
        x = rng.uniform(-0.9, 0.9, 12345).astype(np.float32)
        path = str(tmp_path / "t.wav")
        write_wav(path, x, 16000)
        y, fs = read_wav(path)
        assert fs == 16000
        assert y.dtype == np.float32
        np.testing.assert_allclose(y, x, atol=1.0 / 32768)

    def test_reference_test_wav(self):
        """The reference's bundled smoke asset: 16 kHz mono, 57,585 frames."""
        path = "/root/reference/test.wav"
        if not os.path.isfile(path):
            pytest.skip("reference test.wav not mounted")
        x, fs = read_wav(path)
        assert fs == 16000
        assert x.shape == (57585,)
        assert np.abs(x).max() <= 1.0

    def test_stereo_takes_first_channel(self, tmp_path):
        import struct

        left = np.linspace(-0.5, 0.5, 100)
        right = np.zeros(100)
        inter = np.empty(200)
        inter[0::2] = left
        inter[1::2] = right
        pcm = (np.clip(inter, -1, 1 - 1 / 32768) * 32768).astype("<i2").tobytes()
        hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 8000 * 4, 4, 16)
        hdr += b"data" + struct.pack("<I", len(pcm))
        path = str(tmp_path / "st.wav")
        open(path, "wb").write(hdr + pcm)
        x, fs = read_wav(path)
        assert fs == 8000 and x.shape == (100,)
        np.testing.assert_allclose(x, left, atol=1.0 / 16384)


class TestWavRobustness:
    def test_garbage_bytes_raise_cleanly(self, tmp_path, rng):
        for i, payload in enumerate(
            [b"", b"RIFF", b"RIFFxxxxWAVE", bytes(rng.integers(0, 256, 200, dtype=np.uint8))]
        ):
            path = str(tmp_path / f"g{i}.bin")
            open(path, "wb").write(payload)
            with pytest.raises((ValueError, Exception)):
                read_wav(path)

    def test_truncated_wav_does_not_crash(self, tmp_path, rng):
        path = str(tmp_path / "t.wav")
        write_wav(path, rng.uniform(-0.5, 0.5, 4000).astype(np.float32), 16000)
        data = open(path, "rb").read()
        trunc = str(tmp_path / "trunc.wav")
        open(trunc, "wb").write(data[: len(data) // 2])
        import os as _os

        _os.environ["TPU_SLU_NO_NATIVE"] = "1"
        try:
            x, fs = read_wav(trunc)  # short read: decodes what exists
            assert fs == 16000 and 0 < len(x) < 4000
        finally:
            del _os.environ["TPU_SLU_NO_NATIVE"]

    def test_fuzz_mutated_headers(self, tmp_path, rng):
        """Random header mutations either decode or raise ValueError —
        never crash the process or return NaNs."""
        base = str(tmp_path / "b.wav")
        write_wav(base, rng.uniform(-0.5, 0.5, 1000).astype(np.float32), 16000)
        data = bytearray(open(base, "rb").read())
        for trial in range(50):
            mutated = bytearray(data)
            for _ in range(3):
                pos = int(rng.integers(0, min(64, len(mutated))))
                mutated[pos] = int(rng.integers(0, 256))
            path = str(tmp_path / "m.wav")
            open(path, "wb").write(bytes(mutated))
            try:
                x, _ = read_wav(path)
                assert np.isfinite(x).all() or len(x) == 0
            except (ValueError, ZeroDivisionError):
                pass


class TestTextGrid:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.TextGrid")
        write_textgrid(
            path,
            {
                "words": [(0.0, 0.5, "hello"), (0.5, 1.0, "world")],
                "phones": [(0.0, 0.25, "HH"), (0.25, 0.5, "AH0"), (0.5, 1.0, "sil")],
            },
            1.0,
        )
        tiers = read_textgrid(path)
        assert [iv.mark for iv in tiers["words"]] == ["hello", "world"]
        assert [iv.mark for iv in tiers["phones"]] == ["HH", "AH0", "sil"]
        assert tiers["phones"].intervals[1].minTime == 0.25

    def test_quoted_escapes_and_empty_marks(self, tmp_path):
        path = str(tmp_path / "t.TextGrid")
        write_textgrid(path, {"words": [(0.0, 1.0, "")]}, 1.0)
        tiers = read_textgrid(path)
        assert tiers["words"].intervals[0].mark == ""


@pytest.fixture
def slu_setup(tmp_path):
    slu_root = fixtures.make_slu_dataset(str(tmp_path / "fsc"))
    cfg = fixtures.write_cfg(
        str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"), slu_path=slu_root
    )
    config = read_config(cfg)
    fixtures.write_phonemes_txt(config.folder)
    return config


class TestSLUDatasets:
    def test_builds_and_mutates_config(self, slu_setup):
        config = slu_setup
        train, valid, test = get_SLU_datasets(config)
        assert config.values_per_slot == [2, 2, 2]
        assert set(config.Sy_intent.keys()) == {"action", "object", "location"}
        assert config.num_phonemes == len(fixtures.PHONES)
        assert len(train) == 48 and len(valid) == 16 and len(test) == 16

    def test_batch_shapes_static(self, slu_setup):
        config = slu_setup
        train, _, _ = get_SLU_datasets(config)
        shapes = set()
        for batch in train.loader:
            assert batch["x"].shape[0] == config.training_batch_size
            assert batch["x"].shape[1] % 8000 == 0
            assert batch["y_intent"].shape == (config.training_batch_size, 3)
            assert batch["w"].sum() <= config.training_batch_size
            shapes.add(batch["x"].shape)
        assert len(shapes) <= 3  # bucketing bounds distinct shapes

    def test_upsample_factor(self, slu_setup):
        config = slu_setup
        config.dataset_upsample_factor = 3
        train, _, _ = get_SLU_datasets(config)
        assert len(train) == 48 * 3

    def test_wording_filter(self, slu_setup, tmp_path):
        config = slu_setup
        wording_file = str(tmp_path / "w.txt")
        with open(wording_file, "w") as f:
            f.write("activate the lights in the kitchen\n")
        config.train_wording_path = wording_file
        train, _, _ = get_SLU_datasets(config)
        assert 0 < len(train) < 48
        assert all(
            train.df.loc[i].transcription == "activate the lights in the kitchen"
            for i in range(len(train.df))
        )

    def test_seq2seq_vocab_and_onehot(self, slu_setup):
        config = slu_setup
        config.seq2seq = True
        train, _, _ = get_SLU_datasets(config)
        assert config.Sy_intent[0] == "<sos>" and config.Sy_intent[-1] == "<eos>"
        batch = next(iter(train.loader))
        y = batch["y_intent"]
        assert y.ndim == 3 and y.shape[2] == len(config.Sy_intent)
        np.testing.assert_allclose(y.sum(axis=2), 1.0)  # valid one-hot everywhere

    def test_speaker_subsetting(self, slu_setup):
        config = slu_setup
        config.real_speaker_subset_percentage = 0.5
        np.random.seed(0)
        train, _, _ = get_SLU_datasets(config)
        assert len(set(train.df.speakerId)) == 2  # 4 speakers -> 2


class TestASRDatasets:
    @pytest.fixture
    def asr_config(self, tmp_path):
        asr_root = fixtures.make_asr_dataset(str(tmp_path / "libri"))
        cfg = fixtures.write_cfg(
            str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"),
            asr_path=asr_root, pretraining_type=2,
        )
        return read_config(cfg)

    def test_vocab_built_from_valid_split_and_persisted(self, asr_config):
        config = asr_config
        get_ASR_datasets(config)
        phones = open(os.path.join(config.folder, "pretraining", "phonemes.txt")).read().split()
        words_raw = open(os.path.join(config.folder, "pretraining", "words.txt")).read()
        assert config.num_phonemes == len(phones)
        # stress digits stripped
        assert all(not p[-1].isdigit() for p in phones)
        assert len(words_raw.split("\n")) >= 2

    def test_labels_strided_and_cropped(self, asr_config):
        config = asr_config
        train, valid, test = get_ASR_datasets(config)
        x, yp, yw = train[0]
        assert len(yp) == -(-len(x) // config.phone_downsample_factor) or len(yp) <= -(
            -len(x) // config.phone_downsample_factor
        )
        assert yp.dtype == np.int32
        assert (yp >= -1).all() and (yp < config.num_phonemes).all()

    def test_batch_static_shapes(self, asr_config):
        config = asr_config
        train, _, _ = get_ASR_datasets(config)
        batch = next(iter(train.loader))
        t = batch["x"].shape[1]
        assert t % 8000 == 0
        assert batch["y_phoneme"].shape == (8, -(-t // config.phone_downsample_factor))
        assert batch["y_word"].shape == (8, -(-t // config.word_downsample_factor))


class TestLoader:
    def test_pad_to_bucket(self):
        assert pad_to_bucket(1, 8000) == 8000
        assert pad_to_bucket(8000, 8000) == 8000
        assert pad_to_bucket(8001, 8000) == 16000

    def test_loader_covers_dataset_and_shuffles(self):
        class DS:
            def __len__(self):
                return 10

            def __getitem__(self, i):
                return i

        seen = []
        loader = BatchLoader(DS(), 4, collate=lambda items: list(items), shuffle=True, seed=1)
        for batch in loader:
            seen.extend(batch)
        assert sorted(seen) == list(range(10))
        order1 = seen
        seen2 = []
        for batch in loader:  # second epoch reshuffles
            seen2.extend(batch)
        assert sorted(seen2) == list(range(10))
        assert seen2 != order1


class TestLoaderErrors:
    def test_worker_exception_propagates(self):
        class DS:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                if i == 2:
                    raise FileNotFoundError("missing wav")
                return i

        loader = BatchLoader(DS(), 2, collate=list, shuffle=False)
        with pytest.raises(FileNotFoundError):
            list(loader)


class TestMultiHostLoader:
    """Per-process input sharding for pod slices (loader.py:65-101)."""

    class Ident:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return i

    def _host_streams(self, n, pcount, batch_size=4, seed=3):
        streams = {}
        for pidx in range(pcount):
            loader = BatchLoader(
                self.Ident(n), batch_size, collate=list, shuffle=True, seed=seed,
                process_index=pidx, process_count=pcount,
            )
            batches = list(loader)
            assert len(batches) == len(loader), "len(loader) must match reality"
            streams[pidx] = batches
        return streams

    def test_shards_cover_disjointly_with_equal_batch_counts(self):
        n, pcount = 37, 4
        streams = self._host_streams(n, pcount)
        # every host produces the same number of batches (lockstep collectives)
        assert len({len(b) for b in streams.values()}) == 1
        flat = {p: [i for b in bs for i in b] for p, bs in streams.items()}
        # equal-length shards of ceil(n/pcount) examples
        assert {len(v) for v in flat.values()} == {10}
        # union covers the dataset; wrap-padding duplicates exactly fill the gap
        union = set().union(*[set(v) for v in flat.values()])
        assert union == set(range(n))
        from collections import Counter

        counts = Counter(i for v in flat.values() for i in v)
        assert sum(c - 1 for c in counts.values()) == pcount * 10 - n

    def test_exact_division_is_duplicate_free(self):
        streams = self._host_streams(32, 4)
        flat = [i for bs in streams.values() for b in bs for i in b]
        assert sorted(flat) == list(range(32))

    def test_hosts_agree_on_the_epoch_permutation(self):
        """Shards are strides of ONE seeded permutation, so a global batch
        (same step index on every host) never mixes epochs."""
        n, pcount = 24, 2
        streams_a = self._host_streams(n, pcount)
        order = np.arange(n)
        np.random.default_rng(3 + 0).shuffle(order)  # seed + epoch
        padded = order
        got = np.concatenate([np.asarray(b) for b in streams_a[0]])
        np.testing.assert_array_equal(got, padded[0::2])
        got1 = np.concatenate([np.asarray(b) for b in streams_a[1]])
        np.testing.assert_array_equal(got1, padded[1::2])


def test_all_hosts_sum_single_process_identity():
    from tpu_slu.training.trainer import _all_hosts_sum

    vals = [1.5, np.float32(2.0), 3]
    assert _all_hosts_sum(vals) == vals


def test_export_results_reference_shape(tmp_path):
    """tools/export_results.py strips log.csv to the reference's
    results.csv column set (reference timers_and_such type1_results.csv)."""
    import importlib.util
    import pandas as pd

    spec = importlib.util.spec_from_file_location(
        "export_results",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools", "export_results.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    log = tmp_path / "log.csv"
    pd.DataFrame(
        {
            "intent_loss": [2.0, 1.5],
            "intent_acc": [0.1, 0.4],
            "set": ["train", "valid"],
            "examples_per_sec": [100.0, 0.0],
            "step_ms_p50": [3.0, 0.0],
        }
    ).to_csv(log)
    out = mod.export_results(str(log))
    df = pd.read_csv(out, index_col=0)
    assert list(df.columns) == ["intent_loss", "intent_acc", "set"]
    assert os.path.basename(out) == "results.csv"  # no experiment.cfg nearby


class TestWsolaTempo:
    """Pitch-preserving tempo augmentation (tempo.py) — the sox ``tempo``
    semantics the reference's dead augmentation path requested
    (reference data.py:277-281)."""

    @staticmethod
    def _dominant_hz(x, sr=16000):
        spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        return np.argmax(spec) * sr / len(x)

    def test_length_convention(self):
        from tpu_slu.data.tempo import wsola_tempo

        x = np.random.default_rng(0).standard_normal(64000).astype(np.float32)
        for speed in (0.9, 0.97, 1.03, 1.1):
            y = wsola_tempo(x, speed)
            assert y.dtype == np.float32
            assert len(y) == round(len(x) / speed)  # sox tempo convention
            assert np.isfinite(y).all()

    def test_identity_at_unit_speed(self):
        from tpu_slu.data.tempo import wsola_tempo

        x = np.random.default_rng(1).standard_normal(8000).astype(np.float32)
        np.testing.assert_array_equal(wsola_tempo(x, 1.0), x)

    def test_pitch_preserved(self):
        """A 440 Hz tone time-stretched ±10% keeps its pitch (resampling —
        the pre-round-5 implementation — would move it to 484/400 Hz)."""
        from tpu_slu.data.tempo import wsola_tempo

        sr = 16000
        t = np.arange(sr, dtype=np.float32) / sr
        x = (0.3 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        for speed in (0.9, 1.1):
            y = wsola_tempo(x, speed)
            assert abs(self._dominant_hz(y, sr) - 440.0) < 8.0
            # amplitude roughly preserved (no OLA normalization dips)
            assert 0.25 < np.abs(y[400:-400]).max() < 0.35

    def test_short_input_passthrough(self):
        from tpu_slu.data.tempo import wsola_tempo

        x = np.random.default_rng(2).standard_normal(300).astype(np.float32)
        np.testing.assert_array_equal(wsola_tempo(x, 1.1), x)
