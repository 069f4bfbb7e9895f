"""Vectorized LAPJV vs scipy.linear_sum_assignment (exact-optimum check).

The solver replaces optax's scalar-inner-loop Hungarian in the DETR
criterion (ops/lapjv.py); reference semantics are scipy's inside the torch
HungarianMatcher (Deformable-DETR ``matcher.py``). Assignments may differ
on cost ties — totals must match exactly."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from aldi_tpu.ops.lapjv import lapjv, solve_assignment  # noqa: E402


def _check(cost):
    n, m = cost.shape
    r, c = solve_assignment(jnp.asarray(cost))
    r, c = np.asarray(r), np.asarray(c)
    k = min(n, m)
    assert len(r) == k and len(c) == k
    assert len(set(zip(r.tolist(), c.tolist()))) == k
    assert len(set(r.tolist())) == k and len(set(c.tolist())) == k
    sr, sc = linear_sum_assignment(cost)
    np.testing.assert_allclose(
        cost[r, c].sum(), cost[sr, sc].sum(), rtol=1e-5, atol=1e-5
    )


def test_square_random():
    rng = np.random.default_rng(0)
    for _ in range(10):
        _check(rng.normal(size=(24, 24)).astype(np.float32))


def test_rect_wide_and_tall():
    rng = np.random.default_rng(1)
    for _ in range(5):
        _check(rng.uniform(-5, 5, (8, 31)).astype(np.float32))
        _check(rng.uniform(-5, 5, (31, 8)).astype(np.float32))


def test_constant_pad_columns_detr_structure():
    """The criterion's padded cost shape: [Q=60, G=20] with 14 constant
    columns at the valid max (invalid gt slots)."""
    rng = np.random.default_rng(2)
    for _ in range(5):
        cost = rng.uniform(-40, 100, (60, 20)).astype(np.float32)
        cost[:, 6:] = cost[:, :6].max()
        _check(cost)


def test_degenerate_ties():
    rng = np.random.default_rng(3)
    base = rng.uniform(-1, 1, (1, 16)).astype(np.float32)
    cost = np.repeat(base, 40, axis=0) + rng.normal(
        0, 1e-4, (40, 16)
    ).astype(np.float32)
    _check(cost)


def test_integer_exactness():
    rng = np.random.default_rng(4)
    cost = rng.integers(0, 50, (12, 12)).astype(np.float32)
    r, c = solve_assignment(jnp.asarray(cost))
    sr, sc = linear_sum_assignment(cost)
    assert float(cost[np.asarray(r), np.asarray(c)].sum()) == float(
        cost[sr, sc].sum()
    )


def test_lapjv_col4row_shape():
    rng = np.random.default_rng(5)
    cost = rng.normal(size=(10, 30)).astype(np.float32)
    col4row = np.asarray(lapjv(jnp.asarray(cost)))
    assert col4row.shape == (10,)
    assert len(set(col4row.tolist())) == 10


def test_vmapped_batch():
    rng = np.random.default_rng(6)
    costs = rng.normal(size=(6, 20, 40)).astype(np.float32)
    out = np.asarray(jax.vmap(lapjv)(jnp.asarray(costs)))
    for b in range(6):
        sr, sc = linear_sum_assignment(costs[b])
        got = costs[b][np.arange(20), out[b]].sum()
        np.testing.assert_allclose(got, costs[b][sr, sc].sum(), rtol=1e-5)
