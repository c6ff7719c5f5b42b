"""Gate control mid-run (reference examples/six_node.py): close a gate
partway through the simulation and watch the queue spill back.

Demonstrates imperative control of the functional engine: mutate the
control state between scan segments.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from pednstream_tpu import build_scenario
from pednstream_tpu.engine import simulate

if __name__ == "__main__":
    adj = np.zeros((6, 6), dtype=int)
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]:
        adj[a, b] = adj[b, a] = 1
    params = {
        "unit_time": 10, "simulation_steps": 300, "seed": 9,
        "default_link": {"length": 100, "width": 2, "free_flow_speed": 1.1,
                         "k_critical": 2, "k_jam": 6},
        "demand": {"origin_0": {"peak_lambda": 20, "base_lambda": 8}},
    }
    scn = build_scenario(adj, params, origin_nodes=[0], destination_nodes=[5])
    st = scn.init_state(jax.random.PRNGKey(0))

    # phase 1: free flow for 120 steps
    st, traj1 = simulate(scn, scn.engine_params, st, 120, record=True)
    # close the entry gate of link 3->4 (back_gate_width = 0, link.py:121-126)
    e34 = scn.topo.link_id_to_idx[(3, 4)]
    st = st.replace(back_gate=st.back_gate.at[e34].set(0.0))
    st, traj2 = simulate(scn, scn.engine_params, st, 60, record=True)
    # reopen
    st = st.replace(back_gate=st.back_gate.at[e34].set(2.0))
    st, traj3 = simulate(scn, scn.engine_params, st, 119, record=True)

    d2 = np.asarray(traj2.density)
    e23 = scn.topo.link_id_to_idx[(2, 3)]
    print(f"upstream density while gate closed: {d2[:, e23].max():.2f} "
          f"(queue forms), downstream inflow: {np.asarray(traj2.inflow)[:, e34].max():.0f}")
    d3 = np.asarray(traj3.density)
    print(f"after reopening, upstream density recovers to {d3[-1, e23]:.2f}")
