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
