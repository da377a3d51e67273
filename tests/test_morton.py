"""Morton sorting: key properties and end-to-end equivalence."""

import numpy as np
import pytest

from n_body_problem_tpu import SimConfig, Simulation, models
from n_body_problem_tpu.utils.morton import apply_permutation, morton_argsort, morton_keys


def test_keys_locality():
    """Spatially adjacent points get closer keys than distant ones."""
    pos = np.array([[0.0, 0, 0], [0.01, 0, 0], [10.0, 10, 10]])
    k = morton_keys(pos)
    assert abs(int(k[0]) - int(k[1])) < abs(int(k[0]) - int(k[2]))


def test_argsort_octant_blocks():
    """Points in the same octant sort contiguously."""
    rng = np.random.default_rng(0)
    pos = rng.uniform(-1, 1, (512, 3))
    order = morton_argsort(pos)
    # Octants relative to the quantization midpoint (= box centre).
    mid = (pos.min(0) + pos.max(0)) / 2
    octant = ((pos[order] > mid) * [1, 2, 4]).sum(1)
    # Each octant appears as one contiguous run (8 runs total).
    changes = int((np.diff(octant) != 0).sum())
    assert changes == 7


def test_sorted_simulation_same_physics():
    """Sorting permutes bodies but not the dynamics: energies match."""
    from n_body_problem_tpu import diagnostics as diag

    state = models.plummer(256, seed=3)
    cfg_plain = SimConfig(solver="direct")
    cfg_sorted = SimConfig(solver="direct", morton_sort=True)
    a = Simulation(cfg_plain, state)
    b = Simulation(cfg_sorted, models.plummer(256, seed=3))
    assert b.sort_perm is not None
    a.run(20)
    b.run(20)
    ea = float(diag.total_energy(a.state, cfg_plain))
    eb = float(diag.total_energy(b.state, cfg_sorted))
    assert ea == pytest.approx(eb, rel=1e-5)
    # Unsorting recovers per-body correspondence.
    unsorted = np.empty_like(np.asarray(b.state.pos[: b.state.n_real]))
    unsorted[b.sort_perm] = np.asarray(b.state.pos[: b.state.n_real])
    np.testing.assert_allclose(unsorted, np.asarray(a.state.pos), rtol=1e-4, atol=1e-5)


def test_apply_permutation_roundtrip():
    state = models.plummer(64, seed=1)
    perm = morton_argsort(np.asarray(state.pos))
    s2 = apply_permutation(state, perm)
    inv = np.argsort(perm)
    s3 = apply_permutation(s2, inv)
    np.testing.assert_array_equal(np.asarray(s3.pos), np.asarray(state.pos))


def test_periodic_resort_preserves_physics():
    from n_body_problem_tpu import diagnostics as diag

    base = SimConfig(solver="direct", integrator="leapfrog", dt=0.005)
    a = Simulation(base, models.plummer(200, seed=11))
    b = Simulation(base.replace(morton_sort=True, resort_every=10),
                   models.plummer(200, seed=11))
    a.run(30)
    b.run(30)
    ea = float(diag.total_energy(a.state, base))
    eb = float(diag.total_energy(b.state, base))
    assert eb == pytest.approx(ea, rel=1e-5)
    # unsort maps back to the original body identity
    k = b.state.n_real
    unsorted = np.empty_like(np.asarray(b.state.pos[:k]))
    unsorted[b.sort_perm] = np.asarray(b.state.pos[:k])
    np.testing.assert_allclose(unsorted, np.asarray(a.state.pos[:k]), rtol=1e-3, atol=1e-4)
