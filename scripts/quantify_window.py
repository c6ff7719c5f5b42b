"""Quantify the windowed-history approximation error (H=32/H=64 vs the
exact full-horizon ring) in DETERMINISTIC mode, where trajectory
differences are purely the lookback clamp (stochastic runs diverge
chaotically from any perturbation, which would measure chaos, not the
approximation).

Feeds the numbers quoted in docs/PARITY.md next to the bench.py
grid_50x50 H=32 row.

Run:  JAX_PLATFORMS=cpu python scripts/quantify_window.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def run(scn, steps, demand_mult=1.0):
    from pednstream_tpu.engine import simulate

    ep = scn.engine_params
    if demand_mult != 1.0:
        import jax.numpy as jnp

        ep = ep.replace(demand=jnp.asarray(ep.demand) * demand_mult)
    st = scn.init_state(jax.random.PRNGKey(0))
    _, outs = simulate(scn, ep, st, steps, stochastic=False, record=True)
    return np.asarray(outs.density), np.asarray(outs.num_peds)


def main():
    from pednstream_tpu.generator import NetworkEnvGenerator
    from pednstream_tpu.scenario import build_scenario

    # nominal deterministic runs never congest enough for the lookback
    # clamp to bind (avg travel time stays near free flow, tau < H) —
    # measure at nominal AND with demand inflated to force jams, which
    # is the regime where the windowed approximation actually differs
    for name in ("grid_50x50", "melbourne"):
        gen = NetworkEnvGenerator()
        data = gen.load_network_data(name)
        args = (data["adjacency_matrix"], gen.config["params"],
                gen.config["origin_nodes"], gen.config["destination_nodes"])
        steps = gen.config["params"]["simulation_steps"] - 1
        for mult, label in ((1.0, "nominal"), (8.0, "jam-heavy 8x demand")):
            d_exact, n_exact = run(build_scenario(*args), steps, mult)
            for H in (64, 32, 16):
                d_w, n_w = run(build_scenario(*args, history_window=H),
                               steps, mult)
                dd = np.abs(d_w - d_exact)
                dn = np.abs(n_w - n_exact)
                print(f"{name} [{label}] H={H}: density err mean "
                      f"{dd.mean():.4f} max {dd.max():.3f} ped/m^2 "
                      f"(exact mean density {d_exact.mean():.3f}); "
                      f"num_peds err mean {dn.mean():.3f} max {dn.max():.1f}",
                      flush=True)


if __name__ == "__main__":
    main()
