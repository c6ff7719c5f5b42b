"""Delft-adjacency exploration runs with ad-hoc parameters — the
counterpart of BOTH reference scripts examples/big_network.py (custom
default_link on the delft graph, origins [0, 8]) and
examples/big_network_directions.py (multi-OD with explicit od_flows and
a per-origin demand override).  One jitted lax.scan replaces the Python
time loop; the macosx matplotlib animation is replaced by the
zero-dependency interactive HTML map export.

Run:  python examples/big_network.py              # big_network semantics
      python examples/big_network.py --directions # ..._directions semantics
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from pednstream_tpu.engine import simulate
from pednstream_tpu.io.output_handler import OutputHandler
from pednstream_tpu.scenario import build_scenario

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "data", "delft")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--directions", action="store_true",
                    help="multi-OD variant (big_network_directions.py)")
    ap.add_argument("--html", default=None, metavar="OUT.html",
                    help="also export the interactive HTML map")
    args = ap.parse_args()

    with open(os.path.join(DATA, "node_positions.json")) as f:
        pos = {str(k): np.asarray(v) for k, v in json.load(f).items()}
    adj = np.load(os.path.join(DATA, "adj_matrix.npy"))

    # ad-hoc exploration parameters (reference big_network.py body)
    params = {
        "unit_time": 10,
        "simulation_steps": 500,
        "assign_flows_type": "classic",
        "default_link": {
            "length": 50, "width": 1, "free_flow_speed": 1.5,
            "k_critical": 2, "k_jam": 10, "activity_probability": 0.0,
        },
        "seed": 0,
    }
    if args.directions:
        # big_network_directions.py: five origins, four destinations,
        # constant od_flows, heavier demand at origin 136
        params["demand"] = {"origin_136": {"peak_lambda": 25, "base_lambda": 5}}
        origins, dests = [136, 0, 5, 177, 29], [8, 100, 213, 69]
        od_flows = {(0, 8): 8, (0, 100): 8, (5, 8): 8, (5, 100): 8}
        sim_name = "delft_directions"
    else:
        origins, dests = [0, 8], None
        od_flows = None
        sim_name = "delft_big_network"

    scn = build_scenario(adj, params, origins, dests, od_flows=od_flows,
                         pos=pos)
    print(f"delft: {scn.n_nodes} nodes, {scn.n_links} directed links")

    state = scn.init_state(jax.random.PRNGKey(0))
    t0 = time.time()
    final, outs = simulate(scn, scn.engine_params, state,
                           scn.simulation_steps - 1, stochastic=True,
                           record=True)
    float(np.asarray(final.num_peds).sum())  # materialize before timing
    print("Simulation time: {:.2f}".format(time.time() - t0))

    handler = OutputHandler(base_dir="outputs", simulation_dir=sim_name)
    handler.save_scenario_state(scn, outs)
    print(f"saved outputs/{sim_name}")

    if args.html:
        from pednstream_tpu.viz.html_export import export_interactive_html

        path = export_interactive_html(
            simulation_dir=os.path.join("outputs", sim_name),
            out_path=args.html, title=sim_name)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
