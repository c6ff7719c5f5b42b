"""Delft real-world network full-horizon run with wall-clock timing
(reference examples/delft_exp.py / big_network.py)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pednstream_tpu.engine import simulate
from pednstream_tpu.generator import NetworkEnvGenerator

if __name__ == "__main__":
    gen = NetworkEnvGenerator()
    scn = gen.create_network("delft")
    print(f"delft: {scn.n_nodes} nodes, {scn.n_links} directed links")
    state = scn.init_state(jax.random.PRNGKey(0))
    t0 = time.time()
    final, _ = simulate(scn, scn.engine_params, state, scn.simulation_steps - 1,
                        stochastic=True, record=False)
    jax.block_until_ready(final.density)
    print("Simulation time: {:.2f}".format(time.time() - t0))
