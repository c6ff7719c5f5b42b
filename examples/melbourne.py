"""Melbourne real-world network, full horizon (reference
examples/Melbourne.py): 341 nodes / 938 directed links with measured
corridor lengths and sensor-calibrated demand."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pednstream_tpu.engine import simulate
from pednstream_tpu.generator import NetworkEnvGenerator
from pednstream_tpu.io import OutputHandler

if __name__ == "__main__":
    gen = NetworkEnvGenerator()
    scn = gen.create_network("melbourne")
    print(f"melbourne: {scn.n_nodes} nodes, {scn.n_links} directed links")

    state = scn.init_state(jax.random.PRNGKey(0))
    t0 = time.time()
    final, traj = simulate(scn, scn.engine_params, state,
                           scn.simulation_steps - 1, stochastic=True, record=True)
    jax.block_until_ready(final.density)
    print(f"Simulation time: {time.time() - t0:.2f}")

    handler = OutputHandler(base_dir="outputs", simulation_dir="melbourne")
    handler.save_scenario_state(scn, traj)
    print(f"saved to {handler.simulation_dir}")
