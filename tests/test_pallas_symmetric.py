"""Symmetric half-pair kernel vs the direct oracle (interpret mode)."""

import numpy as np
import pytest

from n_body_problem_tpu import models, pad_state
from n_body_problem_tpu.ops import direct_acc
from n_body_problem_tpu.ops.pallas_symmetric import symmetric_acc

EPS2 = 1e-6
C = 0.1


@pytest.mark.parametrize(
    "n_real,tile",
    [
        (120, 32),   # even K = 4
        (200, 32),   # odd K = 7
        (60, 64),    # K = 1 (pure diagonal triangle)
        (90, 32),    # even K with padding bodies in the last tile
    ],
)
def test_symmetric_matches_direct(n_real, tile):
    state = pad_state(models.plummer(n_real, seed=3), multiple=tile)
    want = direct_acc(state.pos, state.mass, eps2=EPS2, compensate=C)
    got = symmetric_acc(state.pos, state.mass, eps2=EPS2, compensate=C, tile=tile)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=2e-6)


def test_symmetric_momentum_exact():
    """Half-pair evaluation applies +/- the same pair force, so the net
    momentum change is zero to rounding — the property the reference's
    Newton's-3rd-law scheme is built on (kernel.cu:748-761)."""
    import jax.numpy as jnp

    state = pad_state(models.plummer(100, seed=5), multiple=32)
    acc = symmetric_acc(state.pos, state.mass, eps2=EPS2, compensate=C, tile=32)
    net = jnp.sum(state.mass[:, None] * acc, axis=0)
    np.testing.assert_allclose(np.asarray(net), np.zeros(3), atol=1e-6)


def test_symmetric_rejects_misaligned():
    state = models.plummer(100, seed=0)
    with pytest.raises(ValueError):
        symmetric_acc(state.pos, state.mass, eps2=EPS2, tile=64)


def _rel_force_err(got, want):
    got, want = np.asarray(got), np.asarray(want)
    denom = np.maximum(np.linalg.norm(want, axis=1), 1e-12)
    return np.linalg.norm(got - want, axis=1) / denom


@pytest.mark.parametrize(
    "precision,p99_bound,median_bound",
    [
        # Documented fast-math envelopes (docs/numerics.md:48-57, STATUS.md):
        # bf16x3 carries a ~1% p99 force-error floor from the hi/lo split's
        # 2^-17 representation times panel-vs-force cancellation; "mixed"
        # (exact-f32 dots on the near diagonals) is ~10x tighter.
        ("bf16x3", 3e-2, 4e-3),
        ("mixed", 5e-3, 5e-4),
    ],
)
def test_fast_math_error_envelopes(precision, p99_bound, median_bound):
    """The opt-in fast-math modes stay inside their documented envelopes.

    Interpret mode emulates the bf16 splits bit-exactly (the hi/lo
    decomposition happens in the kernel body), so the representation floor
    is visible on CPU. Envelopes are asserted, not prose (VERDICT r1 #5).
    """
    state = pad_state(models.plummer(512, seed=7), multiple=64)
    want = direct_acc(state.pos, state.mass, eps2=EPS2, compensate=C)
    got = symmetric_acc(
        state.pos, state.mass, eps2=EPS2, compensate=C, tile=64,
        precision=precision,
    )
    n_real = 512
    err = _rel_force_err(got, want)[:n_real]
    assert np.percentile(err, 99) < p99_bound, (
        f"{precision}: p99 {np.percentile(err, 99):.2e} above envelope"
    )
    assert np.median(err) < median_bound, (
        f"{precision}: median {np.median(err):.2e} above envelope"
    )
    # And the modes really are different computations, not aliases of f32.
    exact = symmetric_acc(
        state.pos, state.mass, eps2=EPS2, compensate=C, tile=64, precision="f32"
    )
    exact_err = _rel_force_err(exact, want)[:n_real]
    assert np.percentile(exact_err, 99) < 1e-4


def test_mixed_tighter_than_bf16x3():
    """'mixed' runs exact-f32 dots on the near diagonals where weights are
    largest, so its error must be strictly tighter than pure bf16x3."""
    state = pad_state(models.plummer(512, seed=11), multiple=64)
    want = direct_acc(state.pos, state.mass, eps2=EPS2, compensate=C)
    kw = dict(eps2=EPS2, compensate=C, tile=64)
    err_fast = _rel_force_err(
        symmetric_acc(state.pos, state.mass, precision="bf16x3", **kw), want
    )
    err_mixed = _rel_force_err(
        symmetric_acc(state.pos, state.mass, precision="mixed", **kw), want
    )
    assert np.percentile(err_mixed, 99) <= np.percentile(err_fast, 99)
