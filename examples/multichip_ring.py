"""Multi-chip particle sharding demo (runs on a virtual CPU mesh too).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/multichip_ring.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

if jax.device_count() == 1:
    # Sandbox convenience: fall back to the local platform's single device.
    print(f"note: only 1 device ({jax.devices()[0]}); mesh of 1")

import n_body_problem_tpu as nb
from n_body_problem_tpu.parallel import ShardedSimulation, make_ring_mesh

mesh = make_ring_mesh()
cfg = nb.SimConfig(solver="direct", integrator="leapfrog", dt=0.005)
state = nb.models.plummer(4096, seed=0)

sim = ShardedSimulation(cfg, state, mesh, strategy="half_ring")
print(f"mesh: {mesh.devices.size} devices, strategy=half_ring "
      f"(Newton's 3rd law across chips)")

for _ in range(3):
    sim.run(100)
    d = sim.diagnostics()
    print(f"step {d['step']:>4d}  E={d['energy']:.6e}  overspeed={d['overspeed']}")
