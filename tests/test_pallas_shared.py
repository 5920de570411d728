"""Shared-stream joint bidirectional kernels (round 3) vs the scan impl.

These kernels read ONE natural-order time-major stream for both directions
(no flip copies), take the previous layer's h_f/h_b as separate part streams
(no channel concat), and fuse the following ceil-mode downsample into the
kernel epilogue in eval mode. Everything here runs in Pallas interpret mode
on CPU — the same kernel code that compiles on TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_slu import ops
from tpu_slu.models.encoder import _downsample_tm
from tpu_slu.ops.pallas_gru import TIME_BLOCK, bigru_apply_shared


def scan_ref(params, x_btc):
    return ops.gru_apply(params, x_btc, impl="scan")  # (B, T, 2H)


def shared_to_btc(h_f, h_b):
    return jnp.swapaxes(jnp.concatenate([h_f, h_b], axis=-1), 0, 1)


@pytest.mark.parametrize("T", [TIME_BLOCK * 2, TIME_BLOCK * 2 + 3, 5, 65])
def test_shared_forward_matches_scan(rng, T):
    B, D, H = 4, 10, 8
    x = jnp.asarray(rng.standard_normal((B, T, D), dtype=np.float32))
    params = ops.gru_init(jax.random.PRNGKey(0), D, H, bidirectional=True)
    ref = scan_ref(params, x)
    h_f, h_b, pooled = bigru_apply_shared(params, (jnp.swapaxes(x, 0, 1),))
    assert not pooled
    np.testing.assert_allclose(
        np.asarray(shared_to_btc(h_f, h_b)), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


def test_two_part_input_matches_concat(rng):
    """gi = [x1 | x2] @ W_ih in VMEM must equal the concat path."""
    B, T, H = 3, 40, 8
    d1, d2 = 6, 10
    x1 = jnp.asarray(rng.standard_normal((T, B, d1), dtype=np.float32))
    x2 = jnp.asarray(rng.standard_normal((T, B, d2), dtype=np.float32))
    params = ops.gru_init(jax.random.PRNGKey(1), d1 + d2, H, bidirectional=True)
    ref = scan_ref(params, jnp.swapaxes(jnp.concatenate([x1, x2], -1), 0, 1))
    h_f, h_b, _ = bigru_apply_shared(params, (x1, x2))
    np.testing.assert_allclose(
        np.asarray(shared_to_btc(h_f, h_b)), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("method", ["avg", "max"])
@pytest.mark.parametrize("T", [32, 21])  # 21: trailing partial window
def test_fused_pool_matches_scan_plus_downsample(rng, method, T):
    B, D, H, k = 4, 6, 8, 2
    x = jnp.asarray(rng.standard_normal((B, T, D), dtype=np.float32))
    params = ops.gru_init(jax.random.PRNGKey(2), D, H, bidirectional=True)
    ref = ops.downsample(scan_ref(params, x), method, k, time_axis=1)
    h_f, h_b, pooled = bigru_apply_shared(
        params, (jnp.swapaxes(x, 0, 1),), pool=k, pool_method=method
    )
    assert pooled
    np.testing.assert_allclose(
        np.asarray(shared_to_btc(h_f, h_b)), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("T", [TIME_BLOCK * 2, TIME_BLOCK + 5])
def test_train_grads_match_scan(rng, T):
    """Custom-VJP gradients through the shared backward kernel vs
    autodiff-of-scan: x, W_ih, W_hh, both biases, both directions."""
    B, D, H = 3, 6, 8
    x = jnp.asarray(rng.standard_normal((B, T, D), dtype=np.float32))
    params = ops.gru_init(jax.random.PRNGKey(3), D, H, bidirectional=True)
    wout = jnp.asarray(rng.standard_normal((B, T, 2 * H), dtype=np.float32))

    def ref_loss(params, x):
        return jnp.sum(scan_ref(params, x) * wout)

    def got_loss(params, x):
        h_f, h_b, _ = bigru_apply_shared(
            params, (jnp.swapaxes(x, 0, 1),), train=True
        )
        return jnp.sum(shared_to_btc(h_f, h_b) * wout)

    ref_gp, ref_gx = jax.grad(ref_loss, argnums=(0, 1))(params, x)
    got_gp, got_gx = jax.grad(got_loss, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(ref_gx),
                               rtol=1e-4, atol=1e-5)
    for (path_r, leaf_r), (path_g, leaf_g) in zip(
        jax.tree_util.tree_leaves_with_path(ref_gp),
        jax.tree_util.tree_leaves_with_path(got_gp),
    ):
        assert path_r == path_g
        np.testing.assert_allclose(
            np.asarray(leaf_g), np.asarray(leaf_r), rtol=1e-4, atol=1e-5,
            err_msg=str(path_r),
        )


def test_train_grads_two_parts(rng):
    """Per-part input cotangents (the dx column split) vs scan-on-concat."""
    B, T, H, d1, d2 = 2, 24, 8, 5, 7
    x1 = jnp.asarray(rng.standard_normal((T, B, d1), dtype=np.float32))
    x2 = jnp.asarray(rng.standard_normal((T, B, d2), dtype=np.float32))
    params = ops.gru_init(jax.random.PRNGKey(4), d1 + d2, H, bidirectional=True)
    wout = jnp.asarray(rng.standard_normal((T, B, 2 * H), dtype=np.float32))

    def ref_loss(x1, x2):
        out = scan_ref(params, jnp.swapaxes(jnp.concatenate([x1, x2], -1), 0, 1))
        return jnp.sum(jnp.swapaxes(out, 0, 1) * wout)

    def got_loss(x1, x2):
        h_f, h_b, _ = bigru_apply_shared(params, (x1, x2), train=True)
        return jnp.sum(jnp.concatenate([h_f, h_b], -1) * wout)

    ref_g1, ref_g2 = jax.grad(ref_loss, argnums=(0, 1))(x1, x2)
    got_g1, got_g2 = jax.grad(got_loss, argnums=(0, 1))(x1, x2)
    np.testing.assert_allclose(np.asarray(got_g1), np.asarray(ref_g1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_g2), np.asarray(ref_g2),
                               rtol=1e-4, atol=1e-5)


class TestTrainFusedPool:
    """Round-4 fused train path: dropout (full rate, reference order) +
    ceil-avg-pool in the kernel epilogue, h_prev residuals written directly,
    pooled cotangents expanded in the backward kernel (VERDICT r3 ask #2)."""

    @staticmethod
    def _setup(rng, T=21, B=3, D=6, H=8):
        x = jnp.asarray(rng.standard_normal((B, T, D), dtype=np.float32))
        params = ops.gru_init(jax.random.PRNGKey(7), D, H, bidirectional=True)
        return x, params

    @staticmethod
    def _pool_ceil_valid(a, k):
        """avg ceil-pool of a (T, B, H) stream, torch partial-window divisor."""
        Tv = a.shape[0]
        pad = (-Tv) % k
        ap = jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
        cnt = jnp.minimum(
            jnp.full(((Tv + pad) // k,), k), Tv - jnp.arange(0, Tv + pad, k)
        ).astype(jnp.float32)
        return ap.reshape(-1, k, *a.shape[1:]).sum(1) / cnt[:, None, None]

    @pytest.mark.parametrize("T", [32, 21])  # 21: trailing partial window
    def test_nodrop_matches_scan_plus_pool(self, rng, T):
        x, params = self._setup(rng, T)
        k = 2
        seed = jnp.zeros((1,), jnp.uint32)
        ref = ops.downsample(scan_ref(params, x), "avg", k, time_axis=1)
        wout = jnp.asarray(rng.standard_normal(ref.shape, dtype=np.float32))

        def got_loss(params, x):
            h_f, h_b, pooled = bigru_apply_shared(
                params, (jnp.swapaxes(x, 0, 1),), train=True, pool=k,
                pool_method="avg", drop_p=0.0, drop_seed=seed,
            )
            assert pooled
            return jnp.sum(shared_to_btc(h_f, h_b) * wout), shared_to_btc(h_f, h_b)

        def ref_loss(params, x):
            out = ops.downsample(scan_ref(params, x), "avg", k, time_axis=1)
            return jnp.sum(out * wout), out

        (_, got), got_g = jax.value_and_grad(got_loss, argnums=(0, 1), has_aux=True)(params, x)
        (_, ref_out), ref_g = jax.value_and_grad(ref_loss, argnums=(0, 1), has_aux=True)(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref_out),
                                   rtol=1e-5, atol=1e-6)
        for leaf_r, leaf_g in zip(jax.tree.leaves(ref_g), jax.tree.leaves(got_g)):
            np.testing.assert_allclose(np.asarray(leaf_g), np.asarray(leaf_r),
                                       rtol=1e-4, atol=1e-5)

    def test_dropout_mask_semantics_and_grads(self, rng):
        """With dropout on: (a) a pool=1 run recovers a genuine 0/1 mask at
        the full frame rate applied BEFORE pooling (the reference's
        dropout-then-pool order); (b) a pool=2 run with the same seed equals
        the ceil-pool of that same dropped stream (fwd/bwd mask regeneration
        agrees); (c) gradients match a fixed-mask XLA composite exactly."""
        T, H, p = 24, 8, 0.5
        x, params = self._setup(rng, T, H=H)
        xs = jnp.swapaxes(x, 0, 1)
        seed = jnp.asarray([12345], jnp.uint32)

        h_f, h_b, _ = bigru_apply_shared(params, (xs,), train=True)
        d_f, d_b, pooled = bigru_apply_shared(
            params, (xs,), train=True, pool=1, pool_method="avg",
            drop_p=p, drop_seed=seed,
        )
        assert pooled
        m_f = jnp.asarray(np.asarray(d_f) != 0.0)
        m_b = jnp.asarray(np.asarray(d_b) != 0.0)
        for m in (m_f, m_b):  # a real Bernoulli(0.5)-ish mask, not degenerate
            assert 0.3 < float(np.mean(np.asarray(m))) < 0.7
        np.testing.assert_allclose(
            np.asarray(d_f), np.asarray(jnp.where(m_f, h_f / (1 - p), 0.0)),
            rtol=1e-5, atol=1e-6,
        )

        k = 2
        d2_f, d2_b, _ = bigru_apply_shared(
            params, (xs,), train=True, pool=k, pool_method="avg",
            drop_p=p, drop_seed=seed,
        )
        np.testing.assert_allclose(
            np.asarray(d2_f),
            np.asarray(self._pool_ceil_valid(jnp.where(m_f, h_f / (1 - p), 0.0), k)),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(d2_b),
            np.asarray(self._pool_ceil_valid(jnp.where(m_b, h_b / (1 - p), 0.0), k)),
            rtol=1e-5, atol=1e-6,
        )

        wout = jnp.asarray(rng.standard_normal(d2_f.shape, dtype=np.float32))

        def fused_loss(params, x):
            a_f, a_b, _ = bigru_apply_shared(
                params, (jnp.swapaxes(x, 0, 1),), train=True, pool=k,
                pool_method="avg", drop_p=p, drop_seed=seed,
            )
            return jnp.sum(a_f * wout) + jnp.sum(a_b * wout)

        def composite_loss(params, x):
            a_f, a_b, _ = bigru_apply_shared(
                params, (jnp.swapaxes(x, 0, 1),), train=True
            )
            a_f = self._pool_ceil_valid(jnp.where(m_f, a_f / (1 - p), 0.0), k)
            a_b = self._pool_ceil_valid(jnp.where(m_b, a_b / (1 - p), 0.0), k)
            return jnp.sum(a_f * wout) + jnp.sum(a_b * wout)

        fg = jax.grad(fused_loss, argnums=(0, 1))(params, x)
        cg = jax.grad(composite_loss, argnums=(0, 1))(params, x)
        for leaf_c, leaf_f in zip(jax.tree.leaves(cg), jax.tree.leaves(fg)):
            np.testing.assert_allclose(np.asarray(leaf_f), np.asarray(leaf_c),
                                       rtol=1e-4, atol=1e-5)

    def test_seed_changes_mask(self, rng):
        x, params = self._setup(rng, T=16)
        xs = jnp.swapaxes(x, 0, 1)
        outs = [
            bigru_apply_shared(params, (xs,), train=True, pool=1,
                               pool_method="avg", drop_p=0.5,
                               drop_seed=jnp.asarray([s], jnp.uint32))[0]
            for s in (1, 2)
        ]
        assert np.any(np.asarray(outs[0]) != np.asarray(outs[1]))

    def test_encoder_flag_off_matches_on_at_zero_dropout(self, rng, tmp_path,
                                                         monkeypatch):
        """TPU_SLU_TRAIN_FUSED_POOL=0 (full-rate kernels + XLA pool) and the
        default fused path compute the same train-mode function when dropout
        is 0 — same loss, same gradients."""
        monkeypatch.setenv("TPU_SLU_PALLAS_INTERPRET", "1")
        from tests import fixtures
        from tpu_slu import read_config
        from tpu_slu.models import encoder as enc

        path = fixtures.write_cfg(str(tmp_path / "c.cfg"), folder=str(tmp_path / "exp"))
        config = read_config(path)
        config.num_phonemes = 5
        arch = enc.EncoderArch.from_config(config)
        params = enc.init_encoder_params(jax.random.PRNGKey(6), arch)
        x = jnp.asarray(rng.standard_normal((2, 4000), dtype=np.float32))
        t_ph = int(arch.num_frames(4000, upto="phoneme"))
        t_w = int(arch.num_frames(4000))
        yp = jnp.asarray(rng.integers(-1, 5, (2, t_ph)).astype(np.int32))
        yw = jnp.asarray(rng.integers(-1, 10, (2, t_w)).astype(np.int32))

        def loss(params):
            pl_, wl, _, _ = enc.encoder_loss(
                params, arch, x, yp, yw, train=True, gru_impl="pallas"
            )
            return pl_ + wl

        monkeypatch.setenv("TPU_SLU_TRAIN_FUSED_POOL", "0")
        ref_l, ref_g = jax.value_and_grad(loss)(params)
        monkeypatch.setenv("TPU_SLU_TRAIN_FUSED_POOL", "1")
        got_l, got_g = jax.value_and_grad(loss)(params)
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
        for leaf_r, leaf_g in zip(jax.tree.leaves(ref_g), jax.tree.leaves(got_g)):
            np.testing.assert_allclose(np.asarray(leaf_g), np.asarray(leaf_r),
                                       rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("method", ["none", "avg", "max"])
@pytest.mark.parametrize("T", [20, 21])
def test_downsample_tm_matches_batch_major(rng, method, T):
    x = jnp.asarray(rng.standard_normal((T, 3, 5), dtype=np.float32))
    ref = ops.downsample(jnp.swapaxes(x, 0, 1), method, 2, time_axis=1)
    got = jnp.swapaxes(_downsample_tm(x, method, 2), 0, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


class TestEncoderChain:
    """The full encoder stack through the chain path (PartsTM streams,
    conv->RNN transpose, stack hand-off, fused eval pooling) vs scan."""

    @pytest.fixture
    def setup(self, tmp_path):
        from tests import fixtures
        from tpu_slu import read_config
        from tpu_slu.models import encoder as enc

        path = fixtures.write_cfg(str(tmp_path / "c.cfg"), folder=str(tmp_path / "exp"))
        config = read_config(path)
        config.num_phonemes = 5
        arch = enc.EncoderArch.from_config(config)
        params = enc.init_encoder_params(jax.random.PRNGKey(5), arch)
        return enc, arch, params

    def test_eval_features_match_scan(self, setup, rng, monkeypatch):
        monkeypatch.setenv("TPU_SLU_PALLAS_INTERPRET", "1")
        enc, arch, params = setup
        x = jnp.asarray(rng.standard_normal((2, 4000), dtype=np.float32))
        ref = enc.encoder_features(params, arch, x, gru_impl="scan")
        got = enc.encoder_features(params, arch, x, gru_impl="pallas")
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_posteriors_match_scan(self, setup, rng, monkeypatch):
        monkeypatch.setenv("TPU_SLU_PALLAS_INTERPRET", "1")
        enc, arch, params = setup
        x = jnp.asarray(rng.standard_normal((2, 4000), dtype=np.float32))
        ref_p, ref_w = enc.encoder_posteriors(params, arch, x, gru_impl="scan")
        got_p, got_w = enc.encoder_posteriors(params, arch, x, gru_impl="pallas")
        np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref_p),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_w),
                                   rtol=1e-4, atol=1e-5)

    def test_train_loss_grads_match_scan(self, setup, rng, monkeypatch):
        """encoder_loss gradients through the chained train path (full-rate
        kernels + XLA downsample) vs scan. Dropout rates are 0 in the
        fixture cfg, so both impls compute the same function."""
        monkeypatch.setenv("TPU_SLU_PALLAS_INTERPRET", "1")
        enc, arch, params = setup
        x = jnp.asarray(rng.standard_normal((2, 4000), dtype=np.float32))
        t_ph = int(arch.num_frames(4000, upto="phoneme"))
        t_w = int(arch.num_frames(4000))
        yp = jnp.asarray(rng.integers(-1, 5, (2, t_ph)).astype(np.int32))
        yw = jnp.asarray(rng.integers(-1, 10, (2, t_w)).astype(np.int32))

        def loss(params, impl):
            pl_, wl, _, _ = enc.encoder_loss(
                params, arch, x, yp, yw, train=True, gru_impl=impl
            )
            return pl_ + wl

        ref_g = jax.grad(lambda p: loss(p, "scan"))(params)
        got_g = jax.grad(lambda p: loss(p, "pallas"))(params)
        for (path_r, leaf_r), (path_g, leaf_g) in zip(
            jax.tree_util.tree_leaves_with_path(ref_g),
            jax.tree_util.tree_leaves_with_path(got_g),
        ):
            assert path_r == path_g
            np.testing.assert_allclose(
                np.asarray(leaf_g), np.asarray(leaf_r), rtol=2e-4, atol=1e-5,
                err_msg=str(path_r),
            )


def test_intent_logits_chain_matches_scan(rng, monkeypatch):
    """The intent head walks _apply_stack too — the chain must finalize its
    part streams before the linear head (caught live: PartsTM @ tracer)."""
    monkeypatch.setenv("TPU_SLU_PALLAS_INTERPRET", "1")
    from tpu_slu.models import slu as slu_mod
    from tpu_slu.models.encoder import LayerSpec
    from tpu_slu.models.slu import IntentArch, init_intent_params

    arch = IntentArch(
        layers=(
            LayerSpec("gru", 0, "intent_rnn0", (12, 8, True)),
            LayerSpec("select", 1, "s", ()),
            LayerSpec("dropout", 2, "d", (0.5,)),
            LayerSpec("downsample", 3, "ds", ("none", 1)),
        ),
        linear_index=4,
        feat_dim=16,
        values_per_slot=(2, 3),
    )
    params = init_intent_params(jax.random.PRNGKey(6), arch)
    feats = jnp.asarray(rng.standard_normal((3, 20, 12), dtype=np.float32))
    ref = slu_mod.intent_logits(params, arch, feats, gru_impl="scan")
    got = slu_mod.intent_logits(params, arch, feats, gru_impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)

    # and through a gradient (the live failure was under value_and_grad)
    def loss(p, impl):
        return jnp.sum(slu_mod.intent_logits(p, arch, feats, gru_impl=impl))

    ref_g = jax.grad(lambda p: loss(p, "scan"))(params)
    got_g = jax.grad(lambda p: loss(p, "pallas"))(params)
    for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(got_g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_pooled_eval_path_is_differentiable(rng):
    """Gradients THROUGH the fused-pool eval path: the custom bwd recomputes
    via the full-rate core + a differentiable pool replica."""
    B, T, D, H, k = 3, 21, 6, 8, 2
    x = jnp.asarray(rng.standard_normal((B, T, D), dtype=np.float32))
    params = ops.gru_init(jax.random.PRNGKey(7), D, H, bidirectional=True)
    To = -(-T // k)
    wout = jnp.asarray(rng.standard_normal((To, B, 2 * H), dtype=np.float32))

    def ref_loss(params, x):
        out = ops.downsample(scan_ref(params, x), "avg", k, time_axis=1)
        return jnp.sum(jnp.swapaxes(out, 0, 1) * wout)

    def got_loss(params, x):
        h_f, h_b, pooled = bigru_apply_shared(
            params, (jnp.swapaxes(x, 0, 1),), pool=k, pool_method="avg"
        )
        assert pooled
        return jnp.sum(jnp.concatenate([h_f, h_b], -1) * wout)

    ref_gp, ref_gx = jax.grad(ref_loss, argnums=(0, 1))(params, x)
    got_gp, got_gx = jax.grad(got_loss, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(ref_gx),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_gp), jax.tree.leaves(got_gp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pool", [1, 2])
@pytest.mark.parametrize("T", [TIME_BLOCK * 2, TIME_BLOCK * 2 + 3])
def test_rowstack_forward_matches_scan(rng, monkeypatch, T, pool):
    """TPU_SLU_GRU_ROWSTACK=1 swaps in the row-stacked forward kernel (both
    directions' gates in one (2B, 3H) array, bhh's r|z columns folded into
    bih). Measured a perf wash on TPU (kept as a documented experiment,
    docs/KERNELS.md) — but it must stay numerically pinned to scan."""
    monkeypatch.setenv("TPU_SLU_GRU_ROWSTACK", "1")
    B, D, H = 4, 10, 8
    x = jnp.asarray(rng.standard_normal((B, T, D), dtype=np.float32))
    params = ops.gru_init(jax.random.PRNGKey(7), D, H, bidirectional=True)
    ref = scan_ref(params, x)
    if pool > 1:
        ref = ops.downsample(ref, "avg", pool, time_axis=1)
    h_f, h_b, _ = bigru_apply_shared(
        params, (jnp.swapaxes(x, 0, 1),), pool=pool, pool_method="avg"
    )
    np.testing.assert_allclose(
        np.asarray(shared_to_btc(h_f, h_b)), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


def test_fused_frontend_encoder_integration(rng, monkeypatch, tmp_path):
    """TPU_SLU_FUSED_FRONTEND=1 routes the eval conv stack through the fused
    sinc kernel + channels-last convs; features must still match scan.
    (Opt-in path: measured slower than the XLA composition on the flagship
    shape — kept as a documented experiment, docs/KERNELS.md.)"""
    monkeypatch.setenv("TPU_SLU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("TPU_SLU_FUSED_FRONTEND", "1")
    from tests import fixtures
    from tpu_slu import read_config
    from tpu_slu.models import encoder as enc

    path = fixtures.write_cfg(str(tmp_path / "c.cfg"), folder=str(tmp_path / "exp"))
    config = read_config(path)
    config.num_phonemes = 5
    arch = enc.EncoderArch.from_config(config)
    params = enc.init_encoder_params(jax.random.PRNGKey(5), arch)
    x = jnp.asarray(rng.standard_normal((2, 4000), dtype=np.float32))
    ref = enc.encoder_features(params, arch, x, gru_impl="scan")
    got = enc.encoder_features(params, arch, x, gru_impl="pallas")
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


class TestFusedFrontend:
    """sinc + |.| + ceil max-pool + act in one kernel vs the XLA ops."""

    def _params(self):
        from tpu_slu.ops.sinc import mel_init

        b1, band = mel_init(16, 16000)
        return jnp.asarray(b1), jnp.asarray(band)

    @pytest.mark.parametrize("T", [1600, 1555])  # 1555: ragged final window
    def test_matches_xla_ops(self, rng, T):
        from tpu_slu.ops.pallas_frontend import _xla_reference, sinc_frontend_fused

        b1, band = self._params()
        x = jnp.asarray(rng.standard_normal((3, T), dtype=np.float32))
        kw = dict(filt_dim=31, fs=16000, stride=10, padding=15, pool=2)
        ref = _xla_reference(b1, band, x, kw["filt_dim"], kw["fs"], kw["stride"],
                             kw["padding"], kw["pool"], "leaky_relu")
        got = sinc_frontend_fused(b1, band, x, act="leaky_relu", **kw)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_grads_recompute_through_xla(self, rng):
        from tpu_slu.ops.pallas_frontend import _xla_reference, sinc_frontend_fused

        b1, band = self._params()
        x = jnp.asarray(rng.standard_normal((2, 1600), dtype=np.float32))
        kw = dict(filt_dim=31, fs=16000, stride=10, padding=15, pool=2)
        wout_shape = sinc_frontend_fused(b1, band, x, **kw).shape
        wout = jnp.asarray(rng.standard_normal(wout_shape, dtype=np.float32))

        def ref_loss(b1, band, x):
            return jnp.sum(_xla_reference(
                b1, band, x, kw["filt_dim"], kw["fs"], kw["stride"],
                kw["padding"], kw["pool"], "leaky_relu") * wout)

        def got_loss(b1, band, x):
            return jnp.sum(sinc_frontend_fused(b1, band, x, **kw) * wout)

        ref_g = jax.grad(ref_loss, argnums=(0, 1, 2))(b1, band, x)
        got_g = jax.grad(got_loss, argnums=(0, 1, 2))(b1, band, x)
        for a, b in zip(ref_g, got_g):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)
