"""3x3 grid with multi-OD k-shortest-path routing (reference
examples/nine_node.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from pednstream_tpu import build_scenario
from pednstream_tpu.engine import simulate
from pednstream_tpu.io import OutputHandler

if __name__ == "__main__":
    adj = np.zeros((9, 9), dtype=int)

    def conn(a, b):
        adj[a, b] = adj[b, a] = 1

    for r in range(3):
        for c in range(3):
            n = 3 * r + c
            if c < 2:
                conn(n, n + 1)
            if r < 2:
                conn(n, n + 3)

    params = {
        "unit_time": 10,
        "simulation_steps": 600,
        "seed": 7,
        "path_finder": {"k_paths": 3, "temp": 5, "alpha": 1, "beta": 0.5, "omega": 0.8},
        "default_link": {
            "length": 100, "width": 3, "free_flow_speed": 1.1,
            "k_critical": 2, "k_jam": 6,
        },
        "demand": {
            "origin_0": {"pattern": "gaussian_peaks", "peak_lambda": 20, "base_lambda": 8},
            "origin_2": {"pattern": "gaussian_peaks", "peak_lambda": 15, "base_lambda": 5},
        },
    }
    scn = build_scenario(adj, params, origin_nodes=[0, 2],
                         destination_nodes=[8, 6],
                         od_flows={(0, 8): 10, (2, 6): 5, (0, 6): 3})
    # run through t = T so the final cumulative column (read by the
    # offline metrics) is populated
    final, traj = simulate(scn, scn.engine_params,
                           scn.init_state(jax.random.PRNGKey(0)),
                           params["simulation_steps"],
                           stochastic=True, record=True)
    jax.block_until_ready(final.density)
    print("OD paths:", dict(scn.path_builder.od_paths))

    handler = OutputHandler(base_dir="outputs", simulation_dir="nine_node")
    handler.save_scenario_state(scn, traj)

    from pednstream_tpu.rl.metrics import evaluate_run

    for name, m in evaluate_run(str(handler.simulation_dir)).items():
        print(name, {k: round(v, 3) for k, v in m.items() if isinstance(v, (int, float))})
