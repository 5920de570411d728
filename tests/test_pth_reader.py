"""Torch-free ``.pth`` reading (tpu_slu.models.pth_reader).

A TPU host without a torch installation must still be able to load reference
checkpoints (``torch.save`` state_dicts, reference ``training.py:35-39``).
These tests write real torch.save files, then read them back with torch
blocked from importing.
"""

import pickle
import sys

import numpy as np
import pytest
import torch

import jax

from tests import fixtures
from tpu_slu import read_config
from tpu_slu.models import pth_reader
from tpu_slu.models.encoder import EncoderArch, init_encoder_params
from tpu_slu.models.torch_import import (
    export_pretrained_state_dict,
    import_pretrained_state_dict,
)


@pytest.fixture
def config(tmp_path):
    path = fixtures.write_cfg(str(tmp_path / "c.cfg"), folder=str(tmp_path / "exp"))
    config = read_config(path)
    config.num_phonemes = 5
    return config


class TestPthReader:
    def test_flat_dict_roundtrip_all_dtypes(self, tmp_path):
        base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
        sd = {
            "w": torch.randn(3, 4),
            "b": torch.randn(7).double(),
            "idx": torch.arange(5),
            "flag": torch.tensor(True),
            "half": torch.randn(2, 3).half(),
            "scalar": torch.tensor(2.5),
            "noncontig": base[:, ::2],  # strided view: exercises stride handling
            "offset": base.flatten()[3:9],  # nonzero storage_offset
        }
        path = str(tmp_path / "sd.pth")
        torch.save(sd, path)

        assert pth_reader.is_torch_zip(path)
        got = pth_reader.load_state_dict(path)
        assert set(got) == set(sd)
        for k, v in sd.items():
            ref = v.detach().numpy()
            np.testing.assert_array_equal(got[k], ref)
            assert got[k].dtype == ref.dtype
            assert got[k].flags["C_CONTIGUOUS"] or got[k].ndim == 0

    def test_import_pretrained_with_torch_blocked(self, tmp_path, config, monkeypatch):
        arch = EncoderArch.from_config(config)
        params = init_encoder_params(jax.random.PRNGKey(3), arch)
        path = str(tmp_path / "model_state.pth")
        torch.save(export_pretrained_state_dict(params, arch), path)

        # Any fresh ``import torch`` inside the loader must now fail.
        monkeypatch.setitem(sys.modules, "torch", None)
        params2 = import_pretrained_state_dict(path, arch)
        leaves1, leaves2 = jax.tree.leaves(params), jax.tree.leaves(params2)
        assert len(leaves1) == len(leaves2)
        for l1, l2 in zip(leaves1, leaves2):
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    def test_refuses_arbitrary_globals(self, tmp_path):
        path = str(tmp_path / "evil.pth")
        torch.save({"x": torch.randn(2), "arr": np.arange(3)}, path)
        with pytest.raises(pickle.UnpicklingError):
            pth_reader.load_state_dict(path)

    def test_non_zip_rejected(self, tmp_path):
        path = tmp_path / "legacy.pth"
        path.write_bytes(b"not a zip archive")
        assert not pth_reader.is_torch_zip(str(path))

    def test_fallback_to_torch_for_exotic_pickle(self, tmp_path, config):
        # _load_state must still succeed (via torch.load) when the file
        # contains storage types the native reader refuses.
        from tpu_slu.models.torch_import import _load_state

        path = str(tmp_path / "exotic.pth")
        z = torch.randn(2, dtype=torch.complex64)
        torch.save({"x": torch.randn(2), "z": z}, path)
        with pytest.raises(pickle.UnpicklingError):
            pth_reader.load_state_dict(path)
        state = _load_state(path)
        np.testing.assert_array_equal(state["z"], z.numpy())
