"""Melbourne real-world network, full horizon (reference
examples/Melbourne.py): 341 nodes / 938 directed links with measured
corridor lengths and sensor-calibrated demand."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from pednstream_tpu.engine import simulate
from pednstream_tpu.generator import NetworkEnvGenerator
from pednstream_tpu.io import OutputHandler


def make_sensor_demand(data_dir: str):
    """Per-origin demand from the Melbourne pedestrian sensor feed
    (reference examples/Melbourne.py:19-34): minute counts spread to the
    10 s simulation step, looked up via the sensor->node mapping.
    Registered as a custom pattern; an origin uses it when its demand
    config names ``node_demand_from_data``."""
    import pandas as pd

    data = pd.read_csv(os.path.join(data_dir, "melbourne.csv"))
    sensor_node_df = pd.read_csv(os.path.join(data_dir, "sensor_node_df.csv"))

    def node_demand_from_data(origin_node, params=None):
        nearest = sensor_node_df[sensor_node_df["node_id"] == origin_node]["sensor_id"].values[0]
        minute_counts = data[data["Location_ID"] == nearest]["Direction_1"]
        return np.ceil(np.repeat(minute_counts.values / 6, 6))

    return node_demand_from_data


if __name__ == "__main__":
    gen = NetworkEnvGenerator()
    data_dir = str(gen._dataset_dir("melbourne"))
    custom = []
    # the sensor->node mapping file is not bundled with the reference
    # dataset (its own Melbourne.py example fails on this); use the
    # sensor feed only when both files exist
    if all(os.path.exists(os.path.join(data_dir, f))
           for f in ("melbourne.csv", "sensor_node_df.csv")):
        custom = [make_sensor_demand(data_dir)]
    scn = gen.create_network("melbourne", custom_demand_functions=custom)
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
