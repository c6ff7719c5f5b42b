"""Generate bundled synthetic scenario datasets under data/.

Counterpart of the reference's data/create_grid.py plus its hand-written
sim_params.yaml files: every synthetic dataset is produced
programmatically here (grids, corridors, butterfly topologies).  The
real-world measured networks (delft, melbourne: adjacency, corridor
distances, node positions, sensor demand) are consumed in place from the
reference data mount via the generator's dataset search path.

Run:  python scripts/make_datasets.py
"""

import os
import sys

import numpy as np
import yaml

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data")


def grid_adjacency(rows: int, cols: int) -> np.ndarray:
    n = rows * cols
    adj = np.zeros((n, n), dtype=int)
    for r in range(rows):
        for c in range(cols):
            i = r * cols + c
            if c < cols - 1:
                adj[i, i + 1] = adj[i + 1, i] = 1
            if r < rows - 1:
                adj[i, i + cols] = adj[i + cols, i] = 1
    return adj


def chain_adjacency(n: int) -> np.ndarray:
    adj = np.zeros((n, n), dtype=int)
    for i in range(n - 1):
        adj[i, i + 1] = adj[i + 1, i] = 1
    return adj


def butterfly_adjacency() -> np.ndarray:
    """9-node butterfly: two entry arms -> hub 2 -> three middle corridors
    -> hub 6 -> two exit arms."""
    adj = np.zeros((9, 9), dtype=int)
    pairs = [(0, 2), (1, 2), (2, 3), (2, 4), (2, 5),
             (3, 6), (4, 6), (5, 6), (6, 7), (6, 8)]
    for a, b in pairs:
        adj[a, b] = adj[b, a] = 1
    return adj


def base_sim(steps=600, unit=10, seed=42, **pf):
    return {
        "simulation_steps": steps,
        "unit_time": unit,
        "assign_flows_type": "classic",
        "seed": seed,
        **({"path_finder": pf} if pf else {}),
    }


def base_link(**over):
    link = {
        "length": 100, "width": 3, "free_flow_speed": 1.1,
        "k_critical": 2, "k_jam": 6, "gamma": 0.01,
        "fd_type": "yperman", "bi_factor": 1, "activity_probability": 0,
        "speed_noise_std": 0,
    }
    link.update(over)
    return link


FORCE = "--force" in sys.argv


def _resolvable(name: str) -> bool:
    sys.path.insert(0, os.path.join(os.path.dirname(ROOT)))
    from pednstream_tpu.generator import _DEFAULT_DATA_ROOTS

    return any(
        os.path.exists(os.path.join(str(r), name, "sim_params.yaml"))
        for r in _DEFAULT_DATA_ROOTS
    )


def write(name: str, config: dict):
    if not FORCE and _resolvable(name):
        print(f"skip {name}: already resolvable (use --force to overwrite)")
        return
    d = os.path.join(ROOT, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "sim_params.yaml"), "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)
    print(f"wrote data/{name}/sim_params.yaml")


def demand(origins_cfg: dict) -> dict:
    return {f"origin_{o}": cfg for o, cfg in origins_cfg.items()}


def main():
    # -- long_corridor: 6-node bidirectional chain ---------------------------
    write("long_corridor", {
        "network": {
            "adjacency_matrix": chain_adjacency(6).tolist(),
            "origin_nodes": [5, 0],
            "destination_nodes": [0, 5],
        },
        "simulation": base_sim(600, 10, 42, k_paths=1, temp=10, alpha=1,
                               beta=0.5, omega=0.8),
        "default_link": base_link(width=4),
        "controllers": {"enabled": True, "links": ["2-3"]},
        "demand": demand({
            0: {"pattern": "gaussian_peaks", "peak_lambda": 25, "base_lambda": 10},
            5: {"pattern": "sudden_demand", "peak_lambda": 25, "base_lambda": 20},
        }),
    })

    # -- small_network: 6 nodes, Y-shaped ------------------------------------
    adj = np.zeros((6, 6), dtype=int)
    for a, b in [(0, 2), (1, 2), (2, 3), (3, 4), (3, 5)]:
        adj[a, b] = adj[b, a] = 1
    write("small_network", {
        "network": {"adjacency_matrix": adj.tolist(),
                    "origin_nodes": [0, 1], "destination_nodes": [4, 5]},
        "simulation": base_sim(400, 10, 7, k_paths=2, temp=5, alpha=1,
                               beta=0.5, omega=0.8),
        "default_link": base_link(),
        "controllers": {"enabled": True, "nodes": [2]},
        "demand": demand({
            0: {"pattern": "gaussian_peaks", "peak_lambda": 20, "base_lambda": 8},
            1: {"pattern": "constant", "base_lambda": 6},
        }),
    })

    # -- one_intersection_v0: 4-arm star -------------------------------------
    adj = np.zeros((5, 5), dtype=int)
    for j in range(1, 5):
        adj[0, j] = adj[j, 0] = 1
    write("one_intersection_v0", {
        "network": {"adjacency_matrix": adj.tolist(),
                    "origin_nodes": [1, 2], "destination_nodes": [3, 4]},
        "simulation": base_sim(400, 10, 3, k_paths=2, temp=5, alpha=1,
                               beta=0.5, omega=0.8),
        "default_link": base_link(length=80),
        "controllers": {"enabled": True, "nodes": [0]},
        "demand": demand({
            1: {"pattern": "gaussian_peaks", "peak_lambda": 25, "base_lambda": 10},
            2: {"pattern": "gaussian_peaks", "peak_lambda": 15, "base_lambda": 5},
        }),
    })

    # -- nine_intersections: 3x3 grid -----------------------------------------
    write("nine_intersections", {
        "network": {"adjacency_matrix": grid_adjacency(3, 3).tolist(),
                    "origin_nodes": [0, 2], "destination_nodes": [6, 8]},
        "simulation": base_sim(600, 10, 7, k_paths=3, temp=5, alpha=1,
                               beta=0.5, omega=0.8),
        "default_link": base_link(),
        "controllers": {"enabled": True, "nodes": [4]},
        "demand": demand({
            0: {"pattern": "gaussian_peaks", "peak_lambda": 20, "base_lambda": 8},
            2: {"pattern": "sudden_demand", "peak_lambda": 15, "base_lambda": 5},
        }),
    })

    # -- od_flow_example: explicit OD split weights ----------------------------
    write("od_flow_example", {
        "network": {"adjacency_matrix": grid_adjacency(3, 3).tolist(),
                    "origin_nodes": [0, 2], "destination_nodes": [6, 8]},
        "simulation": base_sim(400, 10, 5, k_paths=3, temp=5, alpha=1,
                               beta=0.5, omega=0.8),
        "default_link": base_link(),
        "demand": demand({
            0: {"pattern": "constant", "base_lambda": 10},
            2: {"pattern": "constant", "base_lambda": 8},
        }),
        "od_flows": {"0_8": 10, "0_6": 3, "2_6": 5, "2_8": 2},
    })

    # -- butterfly scenarios: controller hub node 2 -----------------------------
    for name, links_over, act_p in [
        ("butterfly_scA", {"2_5": {"width": 0.01}, "2_3": {"width": 0.01},
                           "0_2": {"width": 6}}, 0.1),
        ("butterfly_scB", {"2_4": {"width": 0.01}, "0_2": {"width": 6}}, 0.1),
        ("butterfly_scC", {"2_5": {"width": 0.01}, "2_3": {"width": 0.01},
                           "0_2": {"width": 6}, "4_6": {"length": 90}}, 0.1),
    ]:
        write(name, {
            "network": {"adjacency_matrix": butterfly_adjacency().tolist(),
                        "origin_nodes": [0, 1], "destination_nodes": [6]},
            "simulation": base_sim(600, 15, 11, k_paths=5, temp=5, alpha=6,
                                   beta=2, omega=4, std_dev=0.05),
            "default_link": base_link(length=60, width=5,
                                      activity_probability=act_p),
            "links": links_over,
            "controllers": {"enabled": True, "nodes": [2]},
            "demand": demand({
                0: {"pattern": "sudden_demand", "peak_lambda": 70, "base_lambda": 40},
                1: {"pattern": "gaussian_peaks", "peak_lambda": 20, "base_lambda": 10},
            }),
        })

    # -- two_coordinators: 7x7 grid, two gater hubs ------------------------------
    write("two_coordinators", {
        "network": {"adjacency_matrix": grid_adjacency(7, 7).tolist(),
                    "origin_nodes": [0, 6], "destination_nodes": [42, 48]},
        "simulation": base_sim(700, 10, 21, k_paths=3, temp=5, alpha=1,
                               beta=0.5, omega=0.8),
        "default_link": base_link(length=80),
        "controllers": {"enabled": True, "nodes": [17, 31]},
        "demand": demand({
            0: {"pattern": "gaussian_peaks", "peak_lambda": 30, "base_lambda": 10},
            6: {"pattern": "gaussian_peaks", "peak_lambda": 25, "base_lambda": 8},
        }),
    })

    # -- 45_intersections: 7x7 grid multi-agent control ----------------------------
    inner = [r * 7 + c for r in range(1, 6) for c in range(1, 6)][:9]
    write("45_intersections", {
        "network": {"adjacency_matrix": grid_adjacency(7, 7).tolist(),
                    "origin_nodes": [0, 6, 42], "destination_nodes": [48, 24]},
        "simulation": base_sim(700, 10, 13, k_paths=3, temp=5, alpha=1,
                               beta=0.5, omega=0.8),
        "default_link": base_link(length=80),
        "controllers": {"enabled": True, "nodes": inner},
        "demand": demand({
            0: {"pattern": "gaussian_peaks", "peak_lambda": 30, "base_lambda": 10},
            6: {"pattern": "sudden_demand", "peak_lambda": 25, "base_lambda": 8},
            42: {"pattern": "constant", "base_lambda": 12},
        }),
    })

    print("done; delft/melbourne load from the reference data mount")


if __name__ == "__main__":
    main()
