"""Checkpoint / resume.

The reference has no checkpointing at all — it can only cold-start from
dataset files (SURVEY.md §5). Here the full ``SimState`` (+ config) round-
trips through a single ``.npz``, and states can also be exported to the
reference's own formats (snap/tab/tipsy via :mod:`n_body_problem_tpu.io`)
so a run is resumable by the reference binary itself.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

from n_body_problem_tpu.config import SimConfig
from n_body_problem_tpu.state import SimState, make_state, to_numpy


def save_checkpoint(
    path: str | pathlib.Path, state: SimState, cfg: SimConfig | None = None
) -> None:
    path = pathlib.Path(path)
    arrays = to_numpy(state)
    meta = {"config": cfg.to_dict() if cfg else None, "version": 1}
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_checkpoint(
    path: str | pathlib.Path,
) -> tuple[SimState, SimConfig | None]:
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        # acc restores the carried acceleration so leapfrog resumes
        # seamlessly.
        state = make_state(
            z["pos"], z["vel"], z["mass"], z["eps"],
            acc=z["acc"],
            n_real=int(z["n_real"]),
            time=float(z["time"]),
            step=int(z["step"]),
        )
    cfg = SimConfig.from_dict(meta["config"]) if meta.get("config") else None
    return state, cfg


def export_snap(path: str | pathlib.Path, state: SimState) -> None:
    """Write the reference-readable NEMO snap format (kernel.cu:433-544)."""
    from n_body_problem_tpu.io.text import BodyData, write_snap
    from n_body_problem_tpu.state import unpad_state

    s = unpad_state(state)
    write_snap(
        path,
        BodyData(
            pos=np.asarray(s.pos), vel=np.asarray(s.vel),
            mass=np.asarray(s.mass), eps=np.asarray(s.eps),
            time=float(s.time),
        ),
    )
