"""Materialize the bundled scenario datasets under data/ so the repo is
self-contained (named datasets no longer need the reference mount).

The synthetic scenarios are re-emitted from the reference's published
scenario definitions (/root/reference/data/<name>/sim_params.yaml,
WaimenMak/PedNStream): a dataset IS its parameter set, so loading
"butterfly_scC" here must mean the same scenario as there.  The YAML is
semantically round-tripped (parse -> normalized dump), grid adjacencies
and node positions round-trip through NumPy/JSON.  The real-world
measured networks (delft, melbourne: surveyed corridor geometry +
sensor demand) stay on the reference data mount by default; pass
--realworld to materialize those too.

``grid_50x50`` is new — a 50x50 scale benchmark (2,500 nodes, 9,800
directed links, the BASELINE.json "melbourne-scale 10k+ links" design
point) with no reference counterpart; its adjacency is declared as
``network.grid`` and synthesized at load time (pednstream_tpu.config.
grid_adjacency) instead of shipping a 2500x2500 matrix.

Run:  python scripts/make_datasets.py [--realworld] [--force]
"""

import json
import os
import shutil
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "data")
REF = os.environ.get("PEDNSTREAM_REFERENCE_DATA", "/root/reference/data")

SYNTHETIC = [
    "long_corridor", "small_network", "one_intersection_v0",
    "nine_intersections", "od_flow_example",
    "butterfly_scA", "butterfly_scB", "butterfly_scC",
    "two_coordinators", "45_intersections",
]
REALWORLD = ["delft", "melbourne"]

FORCE = "--force" in sys.argv


def materialize(name: str):
    src = os.path.join(REF, name)
    dst = os.path.join(OUT, name)
    if not os.path.isdir(src):
        print(f"skip {name}: reference dataset not mounted at {src}")
        return
    if os.path.exists(os.path.join(dst, "sim_params.yaml")) and not FORCE:
        print(f"skip {name}: exists (use --force)")
        return
    os.makedirs(dst, exist_ok=True)

    with open(os.path.join(src, "sim_params.yaml")) as f:
        cfg = yaml.safe_load(f)
    with open(os.path.join(dst, "sim_params.yaml"), "w") as f:
        f.write(
            "# Scenario definition re-emitted from the reference dataset\n"
            f"# (WaimenMak/PedNStream data/{name}/sim_params.yaml) so the\n"
            "# name loads the same scenario without the reference mount.\n"
        )
        yaml.safe_dump(cfg, f, sort_keys=False)

    for fname, loader, saver in [
        ("adj_matrix.npy", np.load,
         lambda p, a: np.save(p, np.asarray(a))),
        ("node_positions.json",
         lambda p: json.load(open(p)),
         lambda p, d: json.dump(d, open(p, "w"), indent=1)),
        ("edge_distances.pkl", None, None),  # copied verbatim (binary pickle)
    ]:
        sp, dp = os.path.join(src, fname), os.path.join(dst, fname)
        if not os.path.exists(sp):
            continue
        if loader is None:
            shutil.copyfile(sp, dp)
        else:
            saver(dp, loader(sp))
    # melbourne sensor demand feed + sensor-to-node mapping
    for extra in ("melbourne.csv", "melbourne_sensor_locations.csv"):
        sp = os.path.join(src, extra)
        if os.path.exists(sp):
            shutil.copyfile(sp, os.path.join(OUT, name, extra))
    print(f"wrote data/{name}")


def write_grid_50x50():
    dst = os.path.join(OUT, "grid_50x50")
    if os.path.exists(os.path.join(dst, "sim_params.yaml")) and not FORCE:
        print("skip grid_50x50: exists (use --force)")
        return
    os.makedirs(dst, exist_ok=True)
    n = 50 * 50
    corners = [0, 49, n - 50, n - 1]
    mids = [25, n - 26]
    cfg = {
        "network": {
            "grid": {"rows": 50, "cols": 50},
            "origin_nodes": corners,
            "destination_nodes": mids,
        },
        "simulation": {
            "simulation_steps": 500,
            "unit_time": 10,
            "assign_flows_type": "classic",
            "seed": 42,
            "path_finder": {"k_paths": 2, "temp": 5, "alpha": 1,
                            "beta": 0.5, "omega": 0.8},
        },
        "default_link": {
            "length": 50, "width": 4, "free_flow_speed": 1.1,
            "k_critical": 2, "k_jam": 6, "gamma": 0.01,
            "speed_noise_std": 0, "fd_type": "yperman", "bi_factor": 1,
            "activity_probability": 0,
        },
        "controllers": {"enabled": True, "nodes": [1275]},  # grid center
        "demand": {
            f"origin_{o}": {"pattern": "gaussian_peaks",
                            "peak_lambda": 40, "base_lambda": 15}
            for o in corners
        },
    }
    with open(os.path.join(dst, "sim_params.yaml"), "w") as f:
        f.write(
            "# 50x50 grid scale benchmark (2,500 nodes / 9,800 directed\n"
            "# links) — the BASELINE.json 10k-link design point.  No\n"
            "# reference counterpart (reference grids are 7x7,\n"
            "# data/create_grid.py); adjacency synthesized at load time.\n"
        )
        yaml.safe_dump(cfg, f, sort_keys=False)
    print("wrote data/grid_50x50")


def main():
    names = list(SYNTHETIC)
    if "--realworld" in sys.argv:
        names += REALWORLD
    for name in names:
        materialize(name)
    write_grid_50x50()
    if "--realworld" not in sys.argv:
        print("delft/melbourne stay on the reference data mount "
              "(measured datasets; pass --realworld to materialize)")


if __name__ == "__main__":
    main()
