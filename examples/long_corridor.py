"""Bidirectional corridor simulation (reference examples/long_corridor.py).

Six-node chain with Poisson demand entering from both ends; runs the
full horizon as one lax.scan on the accelerator, saves reference-format
outputs, and renders a density animation.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from pednstream_tpu import build_scenario
from pednstream_tpu.engine import simulate
from pednstream_tpu.io import OutputHandler
from pednstream_tpu.viz import NetworkVisualizer

if __name__ == "__main__":
    adj = np.array([
        [0, 1, 0, 0, 0, 0],
        [1, 0, 1, 0, 0, 0],
        [0, 1, 0, 1, 0, 0],
        [0, 0, 1, 0, 1, 0],
        [0, 0, 0, 1, 0, 1],
        [0, 0, 0, 0, 1, 0],
    ])
    params = {
        "unit_time": 10,
        "simulation_steps": 600,
        "seed": 42,
        "default_link": {
            "length": 100, "width": 2, "free_flow_speed": 1.1,
            "k_critical": 2, "k_jam": 6, "fd_type": "yperman", "bi_factor": 1,
        },
        "demand": {
            "origin_0": {"peak_lambda": 25, "base_lambda": 5},
            "origin_5": {"peak_lambda": 25, "base_lambda": 5},
        },
    }
    scn = build_scenario(adj, params, origin_nodes=[5, 0])
    state = scn.init_state(jax.random.PRNGKey(0))

    import time

    t0 = time.time()
    final, traj = simulate(scn, scn.engine_params, state,
                           params["simulation_steps"] - 1,
                           stochastic=True, record=True)
    jax.block_until_ready(final.density)
    print(f"Simulation time: {time.time() - t0:.2f}s")

    handler = OutputHandler(base_dir="outputs", simulation_dir="long_corridor")
    handler.save_scenario_state(scn, traj)
    print(f"saved to {handler.simulation_dir}")

    viz = NetworkVisualizer(simulation_dir=str(handler.simulation_dir))
    viz.visualize_network_state(300, edge_property="density",
                                save_path="outputs/long_corridor/density_t300.png")
    viz.plot_link_evolution(["0-1", "2-3", "4-5"],
                            save_path="outputs/long_corridor/link_evolution.png")
    print("rendered snapshots")
