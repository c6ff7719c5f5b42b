"""Generate golden trajectories by RUNNING the reference implementation
(/root/reference) with stochastic sampling replaced by expectations.

The reference has no deterministic mode: np.random.binomial sits on the
hot path (link.py:337-358,382).  For reproducible numerical parity
targets we patch np.random.binomial -> floor(n) * p (the expectation,
with numpy's float-n truncation semantics) and seed demand generation.
The resulting trajectories are saved as .npz fixtures consumed by
tests/test_golden_parity.py.

No reference code is copied — the reference package is imported and
executed as-is.
"""

import sys
import json
import numpy as np

sys.path.insert(0, "/root/reference")

# Patch BEFORE importing reference modules (they call np.random at runtime
# through the module-global, so patching the function is sufficient).
_orig_binomial = np.random.binomial


def _expect_binomial(n, p, size=None):
    return np.floor(np.maximum(np.asarray(n, dtype=np.float64), 0.0)) * p


np.random.binomial = _expect_binomial

from src.LTM.network import Network  # noqa: E402


def run_reference(adj, params, origin_nodes, destination_nodes=None, od_flows=None, steps=None):
    np.random.seed(params.get("seed", 42))
    net = Network(
        adj,
        params,
        origin_nodes=origin_nodes,
        destination_nodes=destination_nodes or [],
        od_flows=od_flows,
        verbose=False,
    )
    T = steps or params["simulation_steps"]
    for t in range(1, T):
        net.network_loading(t)

    keys = sorted(net.links.keys())
    out = {
        "link_keys": np.array([f"{u}_{v}" for (u, v) in keys]),
    }
    for field in [
        "density", "speed", "travel_time", "inflow", "outflow",
        "cumulative_inflow", "cumulative_outflow", "num_pedestrians",
        "sending_flow", "receiving_flow", "link_flow", "avg_travel_time",
    ]:
        out[field] = np.stack([getattr(net.links[k], field) for k in keys])
    # origin/destination virtual flows
    vd, va = {}, {}
    for nid, node in net.nodes.items():
        if node.virtual_incoming_link is not None:
            vd[nid] = node.virtual_incoming_link.cumulative_outflow
        if node.virtual_outgoing_link is not None:
            va[nid] = node.virtual_outgoing_link.cumulative_inflow
    out["virt_nodes"] = np.array(sorted(vd.keys()))
    out["virt_dep_cum"] = np.stack([vd[n] for n in sorted(vd.keys())]) if vd else np.zeros((0, T + 1))
    out["virt_arr_cum"] = np.stack([va[n] for n in sorted(va.keys())]) if va else np.zeros((0, T + 1))
    out["demand"] = np.stack(
        [net.nodes[n].demand if net.nodes[n].demand is not None else np.zeros(T)
         for n in sorted(net.nodes.keys())]
    ) if all(
        (net.nodes[n].demand is None or len(net.nodes[n].demand) in (T, T + 1))
        for n in net.nodes
    ) else None
    return net, out


def scenario_long_corridor(steps=600):
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
        "simulation_steps": steps,
        "seed": 42,
        "default_link": {
            "length": 100, "width": 2, "free_flow_speed": 1.1,
            "k_critical": 2, "k_jam": 6, "fd_type": "yperman", "bi_factor": 1,
            "controller_type": "gate",
        },
        "demand": {
            "origin_0": {"peak_lambda": 25, "base_lambda": 5},
            "origin_5": {"peak_lambda": 25, "base_lambda": 5},
        },
    }
    return adj, params, [5, 0], [], None


def scenario_nine_node(steps=300):
    # 3x3 grid with multi-OD routing (examples/nine_node.py style)
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
        "simulation_steps": steps,
        "seed": 7,
        "assign_flows_type": "classic",
        "path_finder": {"k_paths": 3, "temp": 5, "alpha": 1, "beta": 0.5, "omega": 0.8},
        "default_link": {
            "length": 100, "width": 3, "free_flow_speed": 1.1,
            "k_critical": 2, "k_jam": 6, "fd_type": "yperman", "bi_factor": 1,
        },
        "demand": {
            "origin_0": {"pattern": "gaussian_peaks", "peak_lambda": 20, "base_lambda": 8},
            "origin_2": {"pattern": "gaussian_peaks", "peak_lambda": 15, "base_lambda": 5},
        },
    }
    od_flows = {(0, 8): 10, (2, 6): 5, (0, 6): 3}
    return adj, params, [0, 2], [8, 6], od_flows


def scenario_butterfly(steps=300):
    # butterfly topology with controller hub node 2 and separator link,
    # activity probability on (data/butterfly_scC/sim_params.yaml)
    adj = np.array([
        [0, 0, 1, 0, 0, 0, 0, 0, 0],
        [0, 0, 1, 0, 0, 0, 0, 0, 0],
        [1, 1, 0, 1, 1, 1, 0, 0, 0],
        [0, 0, 1, 0, 0, 0, 1, 0, 0],
        [0, 0, 1, 0, 0, 0, 1, 0, 0],
        [0, 0, 1, 0, 0, 0, 1, 0, 0],
        [0, 0, 0, 1, 1, 1, 0, 1, 1],
        [0, 0, 0, 0, 0, 0, 1, 0, 0],
        [0, 0, 0, 0, 0, 0, 1, 0, 0],
    ])
    params = {
        "unit_time": 15,
        "simulation_steps": steps,
        "seed": 11,
        "path_finder": {"k_paths": 5, "temp": 5, "alpha": 6, "beta": 2, "omega": 4},
        "default_link": {
            "length": 60, "width": 5, "free_flow_speed": 1.1,
            "k_critical": 2, "k_jam": 6, "gamma": 0.01,
            "fd_type": "yperman", "bi_factor": 1, "activity_probability": 0.1,
        },
        "links": {"2_5": {"width": 0.01}, "2_3": {"width": 0.01}, "0_2": {"width": 6}},
        "controllers": {"enabled": True, "nodes": [2]},
        "demand": {
            "origin_0": {"pattern": "gaussian_peaks", "peak_lambda": 70, "base_lambda": 40},
            "origin_1": {"pattern": "gaussian_peaks", "peak_lambda": 20, "base_lambda": 10},
        },
    }
    return adj, params, [0, 1], [6], None


def scenario_optimal_diamond(steps=200):
    # diamond network exercising the 'optimal' LP node solve
    adj = np.array([
        [0, 1, 1, 0],
        [1, 0, 0, 1],
        [1, 0, 0, 1],
        [0, 1, 1, 0],
    ])
    params = {
        "unit_time": 10,
        "simulation_steps": steps,
        "seed": 5,
        "assign_flows_type": "optimal",
        "path_finder": {"k_paths": 2, "temp": 5, "alpha": 1, "beta": 0.5, "omega": 0.8},
        "default_link": {
            "length": 80, "width": 3, "free_flow_speed": 1.1,
            "k_critical": 2, "k_jam": 6, "fd_type": "yperman", "bi_factor": 1,
        },
        "demand": {
            "origin_0": {"pattern": "gaussian_peaks", "peak_lambda": 20, "base_lambda": 8},
        },
    }
    return adj, params, [0], [3], None


def scenario_grid7(steps=250):
    # 7x7 grid in the two_coordinators/45_intersections configuration
    # (reference data/two_coordinators/sim_params.yaml): central gater
    # node 24, k_paths 10 routing, origins/destinations 30<->18
    from pednstream_tpu.config import grid_adjacency

    adj = grid_adjacency(7, 7).astype(int)
    params = {
        "unit_time": 10,
        "simulation_steps": steps,
        "seed": 21,
        "path_finder": {"k_paths": 10, "temp": 5, "alpha": 1, "beta": 0.5,
                        "omega": 0.8},
        "default_link": {
            "length": 50, "width": 4, "free_flow_speed": 1.1,
            "k_critical": 2, "k_jam": 6, "gamma": 0.01,
            "fd_type": "yperman", "bi_factor": 1,
        },
        "controllers": {"enabled": True, "nodes": [24]},
        "demand": {
            "origin_30": {"pattern": "gaussian_peaks", "peak_lambda": 50,
                          "base_lambda": 30},
            "origin_18": {"pattern": "gaussian_peaks", "peak_lambda": 40,
                          "base_lambda": 20},
        },
    }
    return adj, params, [30, 18], [18, 30], None


def scenario_separator_corridor(steps=300):
    # bidirectional corridor with a controllable Separator on corridor
    # 2-3 (controllers.links -> Separator lane-allocation dynamics:
    # own density, no reverse subtraction, synced gate widths) and a
    # sudden_demand pattern
    adj = np.zeros((6, 6), dtype=int)
    for a in range(5):
        adj[a, a + 1] = adj[a + 1, a] = 1
    params = {
        "unit_time": 10,
        "simulation_steps": steps,
        "seed": 9,
        "default_link": {
            "length": 100, "width": 4, "free_flow_speed": 1.1,
            "k_critical": 2, "k_jam": 6, "gamma": 0.01,
            "fd_type": "yperman", "bi_factor": 1,
        },
        "controllers": {"enabled": True, "links": ["2-3"]},
        "demand": {
            "origin_0": {"pattern": "sudden_demand", "peak_lambda": 40,
                         "base_lambda": 25},
            "origin_5": {"pattern": "gaussian_peaks", "peak_lambda": 25,
                         "base_lambda": 10},
        },
    }
    return adj, params, [0, 5], [5, 0], None


def scenario_grid10(steps=250):
    # 10x10 synthesized grid in the grid_50x50 CONFIGURATION (same
    # grid_adjacency generator, same default_link / path_finder / demand
    # style, corner origins -> mid destinations, center gater) — the
    # correctness anchor for the synthesized-topology path the 10k-link
    # flagship bench number rides on (grid_50x50 itself has no feasible
    # reference run)
    from pednstream_tpu.config import grid_adjacency

    n = 10 * 10
    adj = grid_adjacency(10, 10).astype(int)
    corners = [0, 9, n - 10, n - 1]
    mids = [5, n - 6]
    params = {
        "unit_time": 10,
        "simulation_steps": steps,
        "seed": 42,
        "assign_flows_type": "classic",
        "path_finder": {"k_paths": 2, "temp": 5, "alpha": 1, "beta": 0.5,
                        "omega": 0.8},
        "default_link": {
            "length": 50, "width": 4, "free_flow_speed": 1.1,
            "k_critical": 2, "k_jam": 6, "gamma": 0.01,
            "speed_noise_std": 0, "fd_type": "yperman", "bi_factor": 1,
            "activity_probability": 0,
        },
        "controllers": {"enabled": True, "nodes": [44]},  # grid center
        "demand": {
            f"origin_{o}": {"pattern": "gaussian_peaks", "peak_lambda": 40,
                            "base_lambda": 15}
            for o in corners
        },
    }
    return adj, params, corners, mids, None




def scenario_metered_corridor(steps=600):
    # round-4 purpose-built metering funnel
    # (data/metered_corridor/sim_params.yaml): approach links, wide
    # plaza, narrow gated feeder, ungated bottleneck.  The golden run
    # exercises the uncontrolled dynamics (gates full-open) so the
    # fixture pins the ENGINE on this geometry: per-link overrides, the
    # 0.7 m bottleneck, burst demand.
    adj = np.zeros((8, 8), dtype=int)
    for a in range(7):
        adj[a, a + 1] = adj[a + 1, a] = 1
    params = {
        "unit_time": 10,
        "simulation_steps": steps,
        "seed": 7,
        "default_link": {
            "length": 10, "width": 6, "free_flow_speed": 1.1,
            "k_critical": 2, "k_jam": 6, "fd_type": "yperman",
            "bi_factor": 0, "gamma": 0.01,
        },
        "links": {
            "2_3": {"length": 20, "width": 20},
            "3_4": {"length": 60, "width": 2},
            "4_5": {"length": 40, "width": 0.7},
        },
        "demand": {
            "origin_0": {"pattern": "gaussian_peaks", "peak_lambda": 30,
                          "base_lambda": 4},
        },
    }
    return adj, params, [0], [7], None

SCENARIOS = {
    "long_corridor": scenario_long_corridor,
    "nine_node": scenario_nine_node,
    "butterfly": scenario_butterfly,
    "optimal_diamond": scenario_optimal_diamond,
    "grid7": scenario_grid7,
    "separator_corridor": scenario_separator_corridor,
    "grid10": scenario_grid10,
    "metered_corridor": scenario_metered_corridor,
}


if __name__ == "__main__":
    import os

    outdir = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(outdir, exist_ok=True)
    names = sys.argv[1:] or list(SCENARIOS)
    for name in names:
        adj, params, origins, dests, od_flows = SCENARIOS[name]()
        net, out = run_reference(adj, params, origins, dests, od_flows)
        meta = {
            "adj": adj.tolist(), "params": params, "origins": origins,
            "dests": dests,
            "od_flows": {f"{o}_{d}": v for (o, d), v in (od_flows or {}).items()},
        }
        np.savez_compressed(
            os.path.join(outdir, f"{name}.npz"),
            meta=json.dumps(meta),
            **{k: v for k, v in out.items() if v is not None},
        )
        print(f"{name}: saved, links={out['density'].shape[0]}, "
              f"T+1={out['density'].shape[1]}, total peds in final step="
              f"{out['num_pedestrians'][:, -2].sum():.1f}")

