"""Custom demand function (reference examples/spike.py): register a
user-defined demand pattern by name (network.py:88-93,
od_manager.py:75-85)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from pednstream_tpu import build_scenario
from pednstream_tpu.engine import simulate


def spike_demand(origin_id: int, params=None) -> np.ndarray:
    """A flat base load with one sharp synchronized spike."""
    T = params["simulation_steps"]
    demand = np.full(T, 3.0)
    demand[T // 3 : T // 3 + 15] = 60.0
    return demand


if __name__ == "__main__":
    adj = np.zeros((4, 4), dtype=int)
    for a, b in [(0, 1), (1, 2), (2, 3)]:
        adj[a, b] = adj[b, a] = 1
    params = {
        "unit_time": 10, "simulation_steps": 300, "seed": 2,
        "default_link": {"length": 100, "width": 2, "free_flow_speed": 1.1,
                         "k_critical": 2, "k_jam": 6},
        "demand": {"origin_0": {"pattern": "spike_demand"}},
    }
    scn = build_scenario(adj, params, origin_nodes=[0], destination_nodes=[3],
                         demand_pattern=[spike_demand])
    final, traj = simulate(scn, scn.engine_params, scn.init_state(jax.random.PRNGKey(0)),
                           299, record=True)
    dens = np.asarray(traj.density)
    print(f"peak density after spike: {dens.max():.2f} ped/m^2 at step {dens.max(1).argmax()}")
