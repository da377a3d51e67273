"""Time integrators.

- ``semi_implicit_euler``: exactly the reference's shipped integrator
  (``use_acc_update_position``, ``kernel.cu:777-801``):
  ``v += a*dt`` then ``x += v*dt`` with ``a`` evaluated at the step's start.

- ``leapfrog`` (kick-drift-kick): the dev-history capability the reference
  prototyped but did not ship (``project_develop_code.cu:831-859, 1703-1721``).
  Implemented in the "stored acceleration" form so each step costs one force
  evaluation: the carried ``state.acc`` is the force at the current position.

Both are pure ``state -> state`` functions built by :func:`make_integrator`
and are safe inside ``lax.scan``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from n_body_problem_tpu.state import SimState

ForceFn = Callable[[jax.Array, jax.Array], jax.Array]  # (pos, mass) -> acc


def _advance_meta(state: SimState, dt: float) -> tuple[jax.Array, jax.Array]:
    return state.time + jnp.asarray(dt, state.time.dtype), state.step + 1


def semi_implicit_euler_step(state: SimState, force_fn: ForceFn, dt: float) -> SimState:
    acc = force_fn(state.pos, state.mass)
    vel = state.vel + acc * dt
    pos = state.pos + vel * dt
    time, step = _advance_meta(state, dt)
    return SimState(pos=pos, vel=vel, mass=state.mass, eps=state.eps,
                    acc=acc, time=time, step=step, n_real=state.n_real)


def leapfrog_step(state: SimState, force_fn: ForceFn, dt: float) -> SimState:
    """KDK leapfrog. Requires ``state.acc`` = force at ``state.pos``.

    Use :func:`prime_leapfrog` (or run any step once) before the first call
    if the state was constructed with ``acc = 0``; a zero initial acc merely
    degrades the very first half-kick to first order, it does not diverge.
    """
    half = 0.5 * dt
    v_half = state.vel + state.acc * half
    pos = state.pos + v_half * dt
    acc = force_fn(pos, state.mass)
    vel = v_half + acc * half
    time, step = _advance_meta(state, dt)
    return SimState(pos=pos, vel=vel, mass=state.mass, eps=state.eps,
                    acc=acc, time=time, step=step, n_real=state.n_real)


def prime_leapfrog(state: SimState, force_fn: ForceFn) -> SimState:
    """Fill ``state.acc`` with the force at the current position."""
    acc = force_fn(state.pos, state.mass)
    return SimState(pos=state.pos, vel=state.vel, mass=state.mass, eps=state.eps,
                    acc=acc, time=state.time, step=state.step, n_real=state.n_real)


_INTEGRATORS = {
    "semi_implicit_euler": semi_implicit_euler_step,
    "leapfrog": leapfrog_step,
}


def make_integrator(name: str, force_fn: ForceFn, dt: float) -> Callable[[SimState], SimState]:
    try:
        fn = _INTEGRATORS[name]
    except KeyError:
        raise ValueError(f"unknown integrator {name!r}; expected {sorted(_INTEGRATORS)}")

    def step(state: SimState) -> SimState:
        return fn(state, force_fn, dt)

    return step
