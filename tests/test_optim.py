"""Masked Adam: torch-exact lazy freezing semantics (optim.py).

The reference hands ALL params to torch.optim.Adam and freezes by flipping
requires_grad (reference training.py:19): frozen params never step, and a
param unfrozen at epoch k starts with fresh moments and bias-correction t=1.
These tests pin flat_adam_update (raveled, elementwise) against torch's Adam
run under exactly that protocol, through a freeze -> unfreeze schedule.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tpu_slu.training.optim import (
    adam_init,
    adam_update,
    expand_mask,
    flat_adam_init,
    flat_adam_update,
)

LR = 1e-2


def _params(rng):
    return {
        "a": jnp.asarray(rng.standard_normal((3, 4), dtype=np.float32)),
        "b": {"w": jnp.asarray(rng.standard_normal(5, dtype=np.float32))},
    }


def _grad_seq(rng, params, n):
    return [
        jax.tree.map(lambda p: jnp.asarray(rng.standard_normal(p.shape, dtype=np.float32)), params)
        for _ in range(n)
    ]


def _run_torch(params, grads, schedule):
    """torch Adam with requires_grad flipped per the 0/1 mask schedule."""
    tparams = jax.tree.map(lambda p: torch.nn.Parameter(torch.from_numpy(np.asarray(p))), params)
    leaves = jax.tree.leaves(tparams)
    opt = torch.optim.Adam(leaves, lr=LR)
    for g, mask in zip(grads, schedule):
        g_leaves = jax.tree.leaves(g)
        m_leaves = jax.tree.leaves(mask)
        opt.zero_grad()
        for p, gl, ml in zip(leaves, g_leaves, m_leaves):
            p.requires_grad_(bool(ml))
            if ml:
                p.grad = torch.from_numpy(np.asarray(gl))
        opt.step()
    return [p.detach().numpy() for p in leaves]


def _schedule(params):
    """Freeze 'a' for 2 steps, then unfreeze it (ULMFiT-style)."""
    off_a = {"a": 0.0, "b": {"w": 1.0}}
    on = jax.tree.map(lambda _: 1.0, params)
    return [off_a, off_a, on, on, on]


def test_flat_adam_matches_torch_lazy_adam(rng):
    params = _params(rng)
    grads = _grad_seq(rng, params, 5)
    schedule = _schedule(params)

    p, state = params, flat_adam_init(params)
    for g, mask in zip(grads, schedule):
        p, state = flat_adam_update(p, g, state, mask, LR)
    want = _run_torch(params, grads, schedule)
    for got, ref in zip(jax.tree.leaves(p), want):
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_flat_adam_expanded_mask_path_identical(rng):
    """Passing the precomputed (P,) mask vector == passing the pytree."""
    params = _params(rng)
    grads = _grad_seq(rng, params, 5)
    schedule = _schedule(params)

    p1, s1 = params, flat_adam_init(params)
    p2, s2 = params, flat_adam_init(params)
    for g, mask in zip(grads, schedule):
        p1, s1 = flat_adam_update(p1, g, s1, mask, LR)
        p2, s2 = flat_adam_update(p2, g, s2, expand_mask(params, mask), LR)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_per_leaf_adam_matches_flat(rng):
    """adam_update (tensor-parallel path) == flat_adam_update."""
    params = _params(rng)
    grads = _grad_seq(rng, params, 5)
    schedule = _schedule(params)

    pf, sf = params, flat_adam_init(params)
    pl, sl = params, adam_init(params)
    for g, mask in zip(grads, schedule):
        pf, sf = flat_adam_update(pf, g, sf, mask, LR)
        pl, sl = adam_update(pl, g, sl, mask, LR)
    for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(pl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
