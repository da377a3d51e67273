"""Experimental treecode: exactness limit + bounded approximation error."""

import numpy as np
import pytest

from n_body_problem_tpu import models, pad_state
from n_body_problem_tpu.ops import direct_acc
from n_body_problem_tpu.ops.treecode import near_tile_lists, tile_summaries, treecode_acc
from n_body_problem_tpu.utils.morton import apply_permutation, morton_argsort


@pytest.fixture(scope="module")
def sorted_cloud():
    state = models.plummer(2048, seed=0)
    perm = morton_argsort(np.asarray(state.pos))
    return pad_state(apply_permutation(state, perm), multiple=256)


def test_exact_when_all_tiles_near(sorted_cloud):
    s = sorted_cloud
    k = s.n // 64
    a = direct_acc(s.pos, s.mass, eps2=1e-6, compensate=0.1)
    b = treecode_acc(s.pos, s.mass, eps2=1e-6, compensate=0.1, tile=64, max_near=k)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_monopole_error_bounded(sorted_cloud):
    """Fixed-k acceptance keeps median relative error below ~10% at a 25%
    near fraction (documented experimental accuracy, not production)."""
    s = sorted_cloud
    a = np.asarray(direct_acc(s.pos, s.mass, eps2=1e-6, compensate=0.1))
    b = np.asarray(
        treecode_acc(s.pos, s.mass, eps2=1e-6, compensate=0.1, tile=64, max_near=8)
    )
    rel = np.linalg.norm(a - b, axis=1) / (np.linalg.norm(a, axis=1) + 1e-12)
    assert np.median(rel) < 0.1
    assert np.percentile(rel, 99) < 1.0


def test_summaries_and_lists(sorted_cloud):
    s = sorted_cloud
    com, m_tot, r = tile_summaries(s.pos, s.mass, 64)
    k = s.n // 64
    assert com.shape == (k, 3) and m_tot.shape == (k,) and r.shape == (k,)
    total = float(np.asarray(m_tot).sum())
    assert total == pytest.approx(float(np.asarray(s.mass).sum()), rel=1e-5)
    near = np.asarray(near_tile_lists(com, 4))
    assert near.shape == (k, 4)
    np.testing.assert_array_equal(near[:, 0], np.arange(k))  # self first
