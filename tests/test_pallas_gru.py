"""Pallas fused GRU: forward + custom-VJP parity vs the scan implementation.

Runs in Pallas interpret mode on CPU (same kernel code as TPU); the TPU
execution itself was verified bit-exact on hardware (see bench notes).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_slu import ops
from tpu_slu.ops.pallas_gru import TIME_BLOCK, gru_apply_pallas


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("T", [TIME_BLOCK * 2, TIME_BLOCK * 2 + 3, 5])
def test_forward_matches_scan(rng, bidirectional, T):
    B, D, H = 4, 10, 8
    x = jnp.asarray(rng.standard_normal((B, T, D), dtype=np.float32))
    params = ops.gru_init(jax.random.PRNGKey(0), D, H, bidirectional)
    ref = ops.gru_apply(params, x, impl="scan")
    got = gru_apply_pallas(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("T", [TIME_BLOCK * 2, TIME_BLOCK + 5])
def test_grads_match_scan(rng, T):
    """Custom-VJP gradients (x, W_ih, W_hh, b_ih, b_hh) vs autodiff-of-scan."""
    B, D, H = 3, 6, 8
    x = jnp.asarray(rng.standard_normal((B, T, D), dtype=np.float32))
    params = ops.gru_init(jax.random.PRNGKey(1), D, H, bidirectional=True)
    # weight the output so every (t, feature) position has a distinct pull
    wout = jnp.asarray(rng.standard_normal((B, T, 2 * H), dtype=np.float32))

    def loss(fn):
        def f(params, x):
            return jnp.sum(fn(params, x) * wout)

        return f

    ref_gp, ref_gx = jax.grad(loss(lambda p, x: ops.gru_apply(p, x, impl="scan")),
                              argnums=(0, 1))(params, x)
    got_gp, got_gx = jax.grad(loss(lambda p, x: gru_apply_pallas(p, x)),
                              argnums=(0, 1))(params, x)

    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(ref_gx), rtol=1e-4, atol=1e-5)
    for (path_r, leaf_r), (path_g, leaf_g) in zip(
        jax.tree_util.tree_leaves_with_path(ref_gp),
        jax.tree_util.tree_leaves_with_path(got_gp),
    ):
        assert path_r == path_g
        np.testing.assert_allclose(
            np.asarray(leaf_g), np.asarray(leaf_r), rtol=1e-4, atol=1e-5,
            err_msg=str(path_r),
        )


def test_grad_through_stacked_layers(rng):
    """Two stacked pallas bi-GRUs + loss: gradient finite and matches scan."""
    B, T, D, H = 2, 12, 6, 8
    x = jnp.asarray(rng.standard_normal((B, T, D), dtype=np.float32))
    p1 = ops.gru_init(jax.random.PRNGKey(2), D, H, True)
    p2 = ops.gru_init(jax.random.PRNGKey(3), 2 * H, H, True)

    def net(impl):
        def f(params, x):
            p1_, p2_ = params
            h = ops.gru_apply(p1_, x, impl="scan") if impl == "scan" else gru_apply_pallas(p1_, x)
            h = ops.gru_apply(p2_, h, impl="scan") if impl == "scan" else gru_apply_pallas(p2_, h)
            return jnp.sum(h ** 2)

        return f

    ref = jax.grad(net("scan"))((p1, p2), x)
    got = jax.grad(net("pallas"))((p1, p2), x)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("T,lengths", [(TIME_BLOCK * 2, (32, 17, 9, 1)),
                                       (TIME_BLOCK + 5, (21, 21, 5, 12))])
def test_masked_joint_kernel_matches_scan(rng, monkeypatch, T, lengths):
    """gru_apply_masked under Pallas (joint kernel over the per-example
    reversed stream) == the masked scan path, which is itself pinned to
    exact-shape per-example results by tests/test_masking.py."""
    monkeypatch.setenv("TPU_SLU_PALLAS_INTERPRET", "1")
    B, D, H = len(lengths), 10, 8
    x = jnp.asarray(rng.standard_normal((B, T, D), dtype=np.float32))
    n = jnp.asarray(np.array(lengths, np.int32))
    params = ops.gru_init(jax.random.PRNGKey(7), D, H, bidirectional=True)
    ref = ops.gru_apply_masked(params, x, n, impl="scan")
    got = ops.gru_apply_masked(params, x, n, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("B,T", [(1, 4), (1, TIME_BLOCK * 2 + 1), (3, 1)])
def test_edge_shapes(rng, B, T):
    """Tiny batch/length edges (sublane < 8, single step) stay correct."""
    D, H = 6, 8
    x = jnp.asarray(rng.standard_normal((B, T, D), dtype=np.float32))
    params = ops.gru_init(jax.random.PRNGKey(5), D, H, bidirectional=True)
    ref = ops.gru_apply(params, x, impl="scan")
    got = gru_apply_pallas(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("B", [96, 160])
def test_large_batch_auto_blocks(rng, B):
    """B > 64 shrinks the fwd/bwd time blocks (_auto_tb — the VMEM guard the
    driver bench hits at B=128/256); forward AND gradients stay exact."""
    T, D, H = 13, 6, 8
    x = jnp.asarray(rng.standard_normal((B, T, D), dtype=np.float32))
    params = ops.gru_init(jax.random.PRNGKey(6), D, H, bidirectional=True)
    ref = ops.gru_apply(params, x, impl="scan")
    got = gru_apply_pallas(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)

    wout = jnp.asarray(rng.standard_normal((B, T, 2 * H), dtype=np.float32))
    ref_g = jax.grad(lambda p: jnp.sum(ops.gru_apply(p, x, impl="scan") * wout))(params)
    got_g = jax.grad(lambda p: jnp.sum(gru_apply_pallas(p, x) * wout))(params)
    for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(got_g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_vmem_headroom_contract(monkeypatch):
    """Every pallas_call must carry the raised scoped-VMEM limit on TPU.

    The shared bwd kernel's working set (16.08 MB at the flagship shape)
    sits right AT Mosaic's default 16 MB scoped limit, so without an
    explicit limit compile success was context-dependent (the ASR step
    OOM'd only at ~5 s buckets, only in-program). Pin both halves of the
    contract: interpret mode passes no compiler params; TPU mode raises
    the allocator bound to 32 MB."""
    from tpu_slu.ops import pallas_gru as pg

    monkeypatch.setattr(pg, "_interpret", lambda: True)
    assert pg._vmem_params() is None

    monkeypatch.setattr(pg, "_interpret", lambda: False)
    params = pg._vmem_params()
    assert params is not None
    assert params.vmem_limit_bytes == 32 * 1024 * 1024

    # AST walk (not substring counting, ADVICE r4): every call whose callee
    # is named `pallas_call` must pass compiler_params=_vmem_params(...),
    # regardless of formatting, aliasing, or line breaks.
    import ast
    import inspect

    tree = ast.parse(inspect.getsource(pg))
    sites = [
        node
        for node in ast.walk(tree)
        if isinstance(node, ast.Call)
        and (
            (isinstance(node.func, ast.Attribute) and node.func.attr == "pallas_call")
            or (isinstance(node.func, ast.Name) and node.func.id == "pallas_call")
        )
    ]
    assert sites, "expected pallas_call sites in ops/pallas_gru.py"
    for node in sites:
        kw = {k.arg: k.value for k in node.keywords}
        v = kw.get("compiler_params")
        ok = (
            isinstance(v, ast.Call)
            and isinstance(v.func, ast.Name)
            and v.func.id == "_vmem_params"
        )
        assert ok, (
            f"pallas_call at line {node.lineno} does not pass "
            "compiler_params=_vmem_params(); every kernel in this module "
            "needs the raised scoped-VMEM limit"
        )
