"""Cross-engine interoperability: runs saved by this framework must be
readable by the REFERENCE implementation's offline metric functions, and
vice versa (the OutputHandler formats are interchangeable)."""

import os
import sys

import numpy as np
import pytest

import jax

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def saved_run(tmp_path_factory):
    from pednstream_tpu import build_scenario
    from pednstream_tpu.engine import simulate
    from pednstream_tpu.io import OutputHandler

    adj = np.zeros((4, 4), dtype=int)
    for a, b in [(0, 1), (1, 2), (2, 3)]:
        adj[a, b] = adj[b, a] = 1
    params = {
        "unit_time": 10, "simulation_steps": 80, "seed": 1,
        "default_link": {"length": 100, "width": 2, "free_flow_speed": 1.1,
                         "k_critical": 2, "k_jam": 6},
        "demand": {"origin_0": {"peak_lambda": 15, "base_lambda": 5}},
    }
    scn = build_scenario(adj, params, origin_nodes=[0], destination_nodes=[3])
    _, traj = simulate(scn, scn.engine_params, scn.init_state(jax.random.PRNGKey(0)),
                       scn.simulation_steps, stochastic=False, record=True)
    out = tmp_path_factory.mktemp("interop")
    OutputHandler(base_dir=str(out), simulation_dir="run").save_scenario_state(scn, traj)
    return str(out / "run")


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_reference_metrics_read_our_output(saved_run):
    """The reference's rl_utils metric functions consume our run dir."""
    sys.path.insert(0, REFERENCE)
    try:
        from rl.rl_utils import (
            compute_network_throughput,
            compute_total_network_delay,
            compute_served_trips_rate,
        )

        thr = compute_network_throughput(simulation_dir=saved_run)
        assert thr["total_demand"] > 0
        assert 0 <= thr["throughput"] <= 1.2
        delay = compute_total_network_delay(simulation_dir=saved_run)
        assert delay["total_person_time"] > 0
        served = compute_served_trips_rate(simulation_dir=saved_run)
        assert served["total_inflow"] > 0

        # our metric implementations agree with the reference's
        from pednstream_tpu.rl.metrics import (
            compute_network_throughput as ours_thr,
            compute_total_network_delay as ours_delay,
            compute_served_trips_rate as ours_served,
        )

        assert ours_thr(saved_run)["throughput"] == pytest.approx(thr["throughput"])
        assert ours_delay(saved_run)["total_delay"] == pytest.approx(delay["total_delay"])
        assert ours_served(saved_run)["served_trips_rate"] == pytest.approx(
            served["served_trips_rate"]
        )
    finally:
        sys.path.remove(REFERENCE)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_our_metrics_read_reference_output(tmp_path):
    """A run saved by the REFERENCE engine is consumed by our metrics and
    visualizer."""
    sys.path.insert(0, REFERENCE)
    try:
        np.random.binomial  # keep numpy intact; reference runs stochastic here
        from src.LTM.network import Network
        from handlers.output_handler import OutputHandler as RefOutputHandler

        adj = np.zeros((4, 4), dtype=int)
        for a, b in [(0, 1), (1, 2), (2, 3)]:
            adj[a, b] = adj[b, a] = 1
        params = {
            "unit_time": 10, "simulation_steps": 60, "seed": 2,
            "default_link": {"length": 100, "width": 2, "free_flow_speed": 1.1,
                             "k_critical": 2, "k_jam": 6},
            "demand": {"origin_0": {"peak_lambda": 15, "base_lambda": 5}},
        }
        np.random.seed(2)
        net = Network(adj, params, origin_nodes=[0], destination_nodes=[3],
                      verbose=False)
        for t in range(1, 61):
            net.network_loading(t)
        handler = RefOutputHandler(base_dir=str(tmp_path), simulation_dir="refrun")
        handler.save_network_state(net)
    finally:
        sys.path.remove(REFERENCE)

    run_dir = str(tmp_path / "refrun")
    from pednstream_tpu.rl.metrics import evaluate_run

    m = evaluate_run(run_dir)
    assert m["throughput"]["total_demand"] > 0

    import matplotlib

    matplotlib.use("Agg")
    from pednstream_tpu.viz import NetworkVisualizer

    viz = NetworkVisualizer(simulation_dir=run_dir)
    ax = viz.visualize_network_state(30, edge_property="density")
    assert ax is not None
