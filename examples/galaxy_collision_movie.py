"""Two colliding galaxies, rendered to an animated GIF on-device.

    python examples/galaxy_collision_movie.py [out_dir]

Simulates the role of the reference's default dataset (dubinski.tab, two
galaxies on a collision course) with the procedural generator, runs the
whole simulate+render loop as one device program per block, and assembles
movie.gif.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import n_body_problem_tpu as nb
from n_body_problem_tpu.render import FrameWriter, OrbitCamera
from n_body_problem_tpu.render.viewer import assemble_gif

out = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "out/collision")
out.mkdir(parents=True, exist_ok=True)

cfg = nb.SimConfig(dt=0.004, integrator="leapfrog", morton_sort=True)
state = nb.models.galaxy_collision(16384, seed=0)
sim = nb.Simulation(cfg, state)
camera = OrbitCamera(phi_deg=25.0, distance=1.0, aspect=4 / 3)

frames_dir = out / "frames"
with FrameWriter(frames_dir, exposure=0.8) as fw:
    idx = 0
    for block in range(10):
        # 20 frames per block, 5 steps per frame — one device program each.
        frames = sim.movie(100, render_every=5, camera=camera,
                           scale_factors=(7, 7, 7), width=640, height=480)
        for f in np.asarray(frames):
            fw.submit(idx, f)
            idx += 1
        print(f"step {int(sim.state.step)}: {idx} frames")

n = assemble_gif(frames_dir, out / "movie.gif", fps=20)
print(f"wrote {out / 'movie.gif'} ({n} frames)")
