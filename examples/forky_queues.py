"""Diverging queues at a fork (reference examples/forky_queues.py): a
single inflow splitting into two branches with different capacities."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from pednstream_tpu import build_scenario
from pednstream_tpu.engine import simulate

if __name__ == "__main__":
    # 0 -> 1 -> {2 (wide), 3 (narrow)} -> 4
    adj = np.zeros((5, 5), dtype=int)
    for a, b in [(0, 1), (1, 2), (1, 3), (2, 4), (3, 4)]:
        adj[a, b] = adj[b, a] = 1
    params = {
        "unit_time": 10, "simulation_steps": 400, "seed": 4,
        "path_finder": {"k_paths": 2, "temp": 5, "alpha": 1, "beta": 0.5, "omega": 0.8},
        "default_link": {"length": 100, "width": 3, "free_flow_speed": 1.1,
                         "k_critical": 2, "k_jam": 6},
        "links": {"1_3": {"width": 1.0}},  # narrow branch
        "demand": {"origin_0": {"peak_lambda": 30, "base_lambda": 12}},
    }
    scn = build_scenario(adj, params, origin_nodes=[0], destination_nodes=[4])
    final, traj = simulate(scn, scn.engine_params,
                           scn.init_state(jax.random.PRNGKey(0)), 399,
                           stochastic=True, record=True)
    dens = np.asarray(traj.density)
    wide = scn.topo.link_id_to_idx[(1, 2)]
    narrow = scn.topo.link_id_to_idx[(1, 3)]
    print(f"wide branch peak density {dens[:, wide].max():.2f}; "
          f"narrow branch peak density {dens[:, narrow].max():.2f} "
          f"(logit routing shifts flow toward the wide branch)")
