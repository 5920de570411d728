"""Checkpoint I/O: npz + orbax backends, loader process sharding."""

import os

import jax
import numpy as np
import pytest

import jax.numpy as jnp

from tpu_slu.data.loader import BatchLoader
from tpu_slu.training import checkpoint as ckpt


@pytest.fixture
def tree():
    return {
        "a": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3), "b": jnp.ones((3,))},
        "nested": {"0": {"x": jnp.zeros((4, 4), jnp.float32)}},
        "scalar": jnp.asarray(7, jnp.int32),
    }


class TestNpz:
    def test_roundtrip(self, tmp_path, tree):
        path = str(tmp_path / "m.npz")
        ckpt.save_pytree(path, tree)
        out = ckpt.load_pytree(path, tree)
        assert ckpt.tree_equal(tree, out)

    def test_shape_mismatch_raises(self, tmp_path, tree):
        path = str(tmp_path / "m.npz")
        ckpt.save_pytree(path, tree)
        bad = dict(tree)
        bad["a"] = {"w": jnp.zeros((3, 3)), "b": tree["a"]["b"]}
        with pytest.raises(ValueError, match="shape"):
            ckpt.load_pytree(path, bad)

    def test_missing_key_raises(self, tmp_path, tree):
        path = str(tmp_path / "m.npz")
        ckpt.save_pytree(path, tree)
        bigger = dict(tree)
        bigger["extra"] = jnp.zeros((2,))
        with pytest.raises(KeyError):
            ckpt.load_pytree(path, bigger)


class TestOrbax:
    def test_roundtrip(self, tmp_path, tree):
        path = str(tmp_path / "m.orbax")
        ckpt.save(path, tree, backend="orbax")
        out = ckpt.load(path, tree, backend="orbax")
        assert ckpt.tree_equal(tree, out)


class TestCorruptCheckpoint:
    def test_trainer_falls_back_to_scratch(self, tmp_path, capsys):
        """Corrupt checkpoint -> 'starting from scratch' (reference
        training.py:23-33 swallows load errors the same way)."""
        from tests import fixtures
        from tpu_slu import read_config
        from tpu_slu.data.datasets import get_SLU_datasets
        from tpu_slu.models import Model
        from tpu_slu.training.trainer import Trainer

        slu_root = fixtures.make_slu_dataset(str(tmp_path / "fsc"), n_train=8)
        cfg = fixtures.write_cfg(
            str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"), slu_path=slu_root
        )
        config = read_config(cfg)
        fixtures.write_phonemes_txt(config.folder)
        get_SLU_datasets(config)
        model = Model(config)
        trainer = Trainer(model, config)
        path = os.path.join(config.folder, "training", "model_state.npz")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(b"definitely not an npz")
        before = [np.asarray(x).copy() for x in jax.tree.leaves(model.params)]
        trainer.load_checkpoint()
        out = capsys.readouterr().out
        assert "starting from scratch" in out
        for a, b in zip(before, jax.tree.leaves(model.params)):
            np.testing.assert_array_equal(a, np.asarray(b))


class TestProcessSharding:
    class DS:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            return i

    def test_hosts_get_disjoint_covering_shards(self):
        seen = {}
        for pidx in range(4):
            loader = BatchLoader(
                self.DS(), 4, collate=list, shuffle=True, seed=3,
                process_index=pidx, process_count=4,
            )
            items = [i for b in loader for i in b]
            assert len(items) == 5
            seen[pidx] = set(items)
        all_items = set()
        for s in seen.values():
            assert not (all_items & s), "shards overlap"
            all_items |= s
        assert all_items == set(range(20))

    def test_len_accounts_for_sharding(self):
        loader = BatchLoader(
            self.DS(), 4, collate=list, shuffle=False,
            process_index=0, process_count=4,
        )
        assert len(loader) == 2  # 5 items -> 2 batches of 4
