"""Pallas force kernels vs the direct oracle (interpret mode on CPU).

Small tiles keep the interpreter cheap; the same kernels compile natively on
TPU (exercised by bench.py and the driver's compile check).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from n_body_problem_tpu import SimConfig, models, pad_state
from n_body_problem_tpu.ops import direct_acc
from n_body_problem_tpu.ops.pallas_force import pallas_acc

EPS2 = 1e-6
C = 0.1


@pytest.fixture(scope="module")
def padded_cloud():
    state = pad_state(models.plummer(300, seed=7), multiple=128)
    return state.pos, state.mass


def test_pallas_matches_direct(padded_cloud):
    pos, mass = padded_cloud
    want = direct_acc(pos, mass, eps2=EPS2, compensate=C)
    got = pallas_acc(pos, mass, eps2=EPS2, compensate=C, tile_i=64, tile_j=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6)


def test_pallas_single_tile(padded_cloud):
    """Grid degenerates to one tile (covers the j==0 == nj-1 branch overlap)."""
    pos, mass = padded_cloud
    n = pos.shape[0]
    want = direct_acc(pos, mass, eps2=EPS2, compensate=C)
    got = pallas_acc(pos, mass, eps2=EPS2, compensate=C, tile_i=n, tile_j=n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6)


def test_pallas_rejects_misaligned():
    state = models.plummer(100, seed=0)
    with pytest.raises(ValueError):
        pallas_acc(state.pos, state.mass, eps2=EPS2, tile_i=64, tile_j=128)


def test_pallas_plain_softening(padded_cloud):
    pos, mass = padded_cloud
    want = direct_acc(pos, mass, eps2=1e-4, compensate=1.0)
    got = pallas_acc(pos, mass, eps2=1e-4, compensate=1.0, tile_i=64, tile_j=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6)


def test_simulation_with_pallas_solver():
    """Full Simulation path with solver='pallas' (interpret mode on CPU)."""
    cfg = SimConfig(solver="pallas", pallas_tile_i=64, pallas_tile_j=128)
    sim = __import__("n_body_problem_tpu").Simulation(cfg, models.plummer(200, seed=1))
    assert sim.state.n % 128 == 0
    sim.run(3)
    assert int(sim.state.step) == 3
    assert bool(jnp.all(jnp.isfinite(sim.state.pos)))
