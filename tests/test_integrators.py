"""Integrator correctness: reference semantics, orbits, energy drift."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from n_body_problem_tpu import SimConfig, Simulation, make_state, models
from n_body_problem_tpu import diagnostics as diag
from n_body_problem_tpu.models.solar_system import G_AU_YR_MSUN
from n_body_problem_tpu.ops.integrators import make_integrator
from n_body_problem_tpu.simulation import make_step_fn, run_steps


def test_semi_implicit_euler_matches_reference_update():
    """One step must be exactly v += a*dt; x += v*dt (kernel.cu:777-801)."""
    cfg = SimConfig(solver="direct", dt=0.008)
    state = models.plummer(32, seed=0)
    from n_body_problem_tpu.ops.registry import make_force_fn

    force = make_force_fn(cfg)
    a0 = force(state.pos, state.mass)
    step = make_step_fn(cfg)
    out = step(state)
    v_want = state.vel + a0 * cfg.dt
    x_want = state.pos + v_want * cfg.dt
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(v_want), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(x_want), rtol=1e-6)
    assert int(out.step) == 1
    np.testing.assert_allclose(float(out.time), cfg.dt, rtol=1e-6)


def test_two_body_circular_orbit_leapfrog():
    """Equal-mass binary on a circular orbit returns near its start after one
    period under leapfrog."""
    # Bodies at +-0.5 on x, circular speed for separation 1: each orbits the
    # COM with v^2 = G*M_other^2/(M_tot*r_sep) => for m=m, v = sqrt(G*m/(2*sep)).
    m = 1.0
    sep = 1.0
    v = np.sqrt(m / (2 * sep))  # G=1
    pos = np.array([[-0.5, 0, 0], [0.5, 0, 0]])
    vel = np.array([[0, -v, 0], [0, v, 0]])
    state = make_state(pos, vel, np.array([m, m]))
    period = 2 * np.pi * 0.5 / v
    n_steps = 2000
    cfg = SimConfig(solver="direct", integrator="leapfrog",
                    dt=period / n_steps, eps2=1e-12, compensate=1.0)
    sim = Simulation(cfg, state)
    sim.run(n_steps)
    np.testing.assert_allclose(np.asarray(sim.state.pos), pos, atol=2e-3)


@pytest.mark.parametrize("integrator,tol", [("leapfrog", 1e-4), ("semi_implicit_euler", 5e-3)])
def test_energy_drift_plummer(integrator, tol):
    """Relative energy drift over 200 steps stays bounded (BASELINE.md
    north-star check, scaled down for CPU CI)."""
    cfg = SimConfig(solver="direct", integrator=integrator, dt=0.002,
                    eps2=1e-6, compensate=0.1)
    state = models.plummer(256, seed=4)
    sim = Simulation(cfg, state)
    e0 = float(diag.total_energy(sim.state, cfg))
    sim.run(200)
    e1 = float(diag.total_energy(sim.state, cfg))
    assert abs((e1 - e0) / e0) < tol


def test_momentum_conserved_under_scan():
    cfg = SimConfig(solver="direct", integrator="leapfrog", dt=0.005)
    state = models.plummer(128, seed=5)
    sim = Simulation(cfg, state)
    p0 = np.asarray(diag.momentum(sim.state))
    sim.run(100)
    p1 = np.asarray(diag.momentum(sim.state))
    np.testing.assert_allclose(p1, p0, atol=1e-4)


def test_earth_period():
    """Earth completes one orbit in ~1 year (D6 fixture role)."""
    state = models.solar_system(seed=0)
    cfg = SimConfig(solver="direct", integrator="leapfrog", dt=1.0 / 2000,
                    eps2=1e-12, compensate=1.0, G=G_AU_YR_MSUN)
    sim = Simulation(cfg, state)
    start = np.asarray(sim.state.pos[3])
    sim.run(2000)  # 1 year
    end = np.asarray(sim.state.pos[3])
    # Earth at 1 AU: back within ~2% of an orbit circumference.
    assert np.linalg.norm(end - start) < 0.15


def test_trajectory_collection():
    cfg = SimConfig(solver="direct", dt=0.01)
    state = models.plummer(64, seed=6)
    sim = Simulation(cfg, state)
    hist = sim.trajectory(20, save_every=5)
    assert hist.shape == (4, 64, 3)
    assert int(sim.state.step) == 20


def test_device_movie():
    """Simulate + render inside one scan: frames stack on device."""
    from n_body_problem_tpu.render import OrbitCamera

    cfg = SimConfig(solver="direct", dt=0.01)
    sim = Simulation(cfg, models.plummer(64, seed=7))
    frames = sim.movie(20, render_every=5, camera=OrbitCamera(distance=3.0),
                       width=64, height=48)
    assert frames.shape == (4, 48, 64, 3)
    assert int(sim.state.step) == 20
    assert float(jnp.max(frames)) > 0.0


def test_leapfrog_second_order_convergence():
    """Halving dt must cut leapfrog's energy error ~4x (2nd order);
    semi-implicit Euler only ~2x (1st order)."""
    from n_body_problem_tpu import diagnostics as diag

    t_total = 0.64

    def drift(integrator, dt):
        cfg = SimConfig(solver="direct", integrator=integrator, dt=dt)
        sim = Simulation(cfg, models.plummer(64, seed=12))
        e0 = float(diag.total_energy(sim.state, cfg))
        sim.run(int(round(t_total / dt)))
        e1 = float(diag.total_energy(sim.state, cfg))
        return abs((e1 - e0) / e0)

    lf_coarse, lf_fine = drift("leapfrog", 0.008), drift("leapfrog", 0.004)
    assert lf_coarse / max(lf_fine, 1e-12) > 2.5  # ~4 expected

    eu_coarse, eu_fine = drift("semi_implicit_euler", 0.008), drift("semi_implicit_euler", 0.004)
    assert eu_coarse / max(eu_fine, 1e-12) > 1.4  # ~2 expected
