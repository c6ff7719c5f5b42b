"""Golden fixture for the real-world delft network (818 directed links,
measured corridor lengths): runs the reference via its own env_loader
with binomial patched to its expectation. See gen_golden.py."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")
np.random.binomial = lambda n, p, size=None: np.floor(
    np.maximum(np.asarray(n, dtype=np.float64), 0.0)
) * p
# deterministic mode also zeroes Gaussian perturbations (delft configures
# speed_noise_std=0.05, applied per FD evaluation, functions.py:132-133)
np.random.normal = lambda loc=0.0, scale=1.0, size=None: (
    np.zeros(size) if size is not None else 0.0
)

from src.utils.env_loader import NetworkEnvGenerator as RefGen  # noqa: E402


def main(steps=200, dataset="delft"):
    np.random.seed(42)
    gen = RefGen()
    net = gen.create_network(dataset)
    T = min(steps, gen.config["params"]["simulation_steps"])
    for t in range(1, T):
        net.network_loading(t)
    keys = sorted(net.links.keys())
    out = {"link_keys": np.array([f"{u}_{v}" for (u, v) in keys])}
    for field in ["density", "inflow", "outflow", "cumulative_inflow",
                  "cumulative_outflow", "num_pedestrians", "sending_flow",
                  "receiving_flow", "speed", "travel_time"]:
        out[field] = np.stack([getattr(net.links[k], field)[: T + 1] for k in keys])
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                          "tests", "golden")
    np.savez_compressed(
        os.path.join(outdir, f"{dataset}.npz"),
        meta=json.dumps({"dataset": dataset, "steps": T}), **out,
    )
    print(f"{dataset}: saved {len(keys)} links x {T} steps")


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    dataset = sys.argv[2] if len(sys.argv) > 2 else "delft"
    main(steps, dataset)
