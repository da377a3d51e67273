"""Force-solver equivalence and physics properties.

Mirrors the reference's validation strategy — cross-checking the optimized
kernels against a serial ground truth (SURVEY.md §4) — done properly:
every backend must agree with a float64 numpy direct sum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from n_body_problem_tpu import SimConfig, models, pad_state
from n_body_problem_tpu.ops import blocked_acc, direct_acc, mxu_acc
from n_body_problem_tpu.ops.registry import make_force_fn

EPS2 = 1e-6
C = 0.1


def numpy_reference_acc(pos, mass, eps2=EPS2, c=C, G=1.0):
    """float64 oracle implementing the reference pair math
    (kernel.cu:665-692) literally: d' = c*(pj-pi), w = rsqrt(|d'|^2+eps)^3*c^2."""
    pos = np.asarray(pos, np.float64)
    mass = np.asarray(mass, np.float64)
    n = pos.shape[0]
    acc = np.zeros((n, 3))
    for i in range(n):
        d = (pos - pos[i]) * c
        r2 = (d * d).sum(-1) + eps2
        w = G * mass * (c * c) / np.sqrt(r2) ** 3
        acc[i] = (w[:, None] * d).sum(0)
    return acc


@pytest.fixture(scope="module")
def cloud():
    state = models.plummer(256, seed=1)
    return np.asarray(state.pos), np.asarray(state.mass)


def test_direct_matches_numpy_oracle(cloud):
    pos, mass = cloud
    want = numpy_reference_acc(pos, mass)
    got = direct_acc(jnp.asarray(pos), jnp.asarray(mass), eps2=EPS2, compensate=C)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("backend", ["blocked", "mxu"])
def test_backends_match_direct(cloud, backend):
    pos, mass = cloud
    pos_j, mass_j = jnp.asarray(pos), jnp.asarray(mass)
    want = direct_acc(pos_j, mass_j, eps2=EPS2, compensate=C)
    fn = {"blocked": blocked_acc, "mxu": mxu_acc}[backend]
    got = fn(pos_j, mass_j, eps2=EPS2, compensate=C, block_size=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_registry_dispatch(cloud):
    pos, mass = cloud
    n = pos.shape[0]
    cfg = SimConfig(solver="mxu", block_size=64)
    fn = make_force_fn(cfg)
    acc = fn(jnp.asarray(pos), jnp.asarray(mass))
    assert acc.shape == (n, 3)


def test_zero_mass_padding_is_inert():
    """Padding bodies (mass 0 at origin) must not perturb real bodies
    — the invariant the reference's K*256+1 padding relies on
    (kernel.cu:260-278)."""
    state = models.plummer(100, seed=2)
    padded = pad_state(state, multiple=64)
    assert padded.n == 128
    a_real = direct_acc(state.pos, state.mass, eps2=EPS2, compensate=C)
    a_pad = direct_acc(padded.pos, padded.mass, eps2=EPS2, compensate=C)
    np.testing.assert_allclose(np.asarray(a_pad[:100]), np.asarray(a_real), rtol=1e-5, atol=1e-6)


def test_momentum_conservation_in_force():
    """Newton's 3rd law: sum_i m_i a_i = 0 (the property the reference's
    symmetric kernel exploits, kernel.cu:748-761)."""
    state = models.plummer(128, seed=3)
    acc = direct_acc(state.pos, state.mass, eps2=EPS2, compensate=C)
    net = jnp.sum(state.mass[:, None] * acc, axis=0)
    np.testing.assert_allclose(np.asarray(net), np.zeros(3), atol=1e-6)


def test_two_body_closed_form():
    """Pair force against the closed-form softened value."""
    pos = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    mass = jnp.array([2.0, 3.0])
    acc = direct_acc(pos, mass, eps2=1e-6, compensate=0.1)
    eps_eff = 1e-6 / 0.01
    expect = 3.0 * (1.0 + eps_eff) ** -1.5  # on body 0, +x direction
    np.testing.assert_allclose(float(acc[0, 0]), expect, rtol=1e-5)
    np.testing.assert_allclose(float(acc[1, 0]), -2.0 / 3.0 * expect, rtol=1e-5)
    # action-reaction with mass ratio
    np.testing.assert_allclose(float(acc[1, 0]) * 3.0, -float(acc[0, 0]) * 2.0, rtol=1e-5)


def test_plain_softening_mode():
    """compensate=1 reduces to the textbook Plummer-softened sum
    (the method-B math, kernel.cu:808-824, with eps2 unscaled)."""
    pos = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
    mass = jnp.array([1.0, 1.0])
    acc = direct_acc(pos, mass, eps2=1e-6, compensate=1.0)
    expect = 0.5 / (0.25 + 1e-6) ** 1.5
    np.testing.assert_allclose(float(acc[0, 0]), expect, rtol=1e-5)


def test_pair_matrix_foil_matches_direct():
    """Dev-history Method A (project_develop_code.cu:657-861): the
    materialized half-pair force matrix reproduces the direct sum —
    including force->acceleration division and massless padding."""
    from n_body_problem_tpu import models, pad_state
    from n_body_problem_tpu.ops.pair_matrix import pair_matrix_acc

    state = pad_state(models.plummer(300, seed=21), multiple=64)
    want = direct_acc(state.pos, state.mass, eps2=1e-6)
    got = pair_matrix_acc(state.pos, state.mass, eps2=1e-6)
    # Padding rows are massless: Method A divides force by mass, so they
    # are zero by construction (the direct path also gives ~0 there).
    np.testing.assert_allclose(np.asarray(got[:300]), np.asarray(want[:300]),
                               rtol=2e-4, atol=2e-6)
    assert np.all(np.asarray(got[300:]) == 0.0)


def test_pair_matrix_refuses_large_n():
    import pytest as _pytest

    from n_body_problem_tpu.ops.pair_matrix import pair_matrix_acc

    with _pytest.raises(ValueError):
        pair_matrix_acc(jnp.zeros((40000, 3)), jnp.ones(40000), eps2=1e-6)
