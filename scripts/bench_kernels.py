"""Kernel/bench matrix on real TPU: XLA one-hot path vs fused Pallas
path at melbourne (938 links) and grid_50x50 (9,800 links) scales, plus
single-replica latency variants (full-horizon vs windowed, exact vs
hybrid binomial).  Feeds docs/PERFORMANCE.md and the bench.py defaults.

Run:  nohup python scripts/bench_kernels.py > /tmp/bench_kernels.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(scn, batch, steps, warm=True, seed0=1):
    import jax

    from pednstream_tpu.engine import simulate_batched, step_fn

    ep = scn.engine_params

    def rollout(st):
        def body(s, _):
            s, _ = step_fn(scn, ep, s, stochastic=True, record=False)
            return s, None
        return jax.lax.scan(body, st, None, length=steps)[0]

    if batch == 1:
        run = jax.jit(rollout)
        mk = lambda k: scn.init_state(k)
    else:
        run = jax.jit(lambda ss: simulate_batched(scn, ep, ss, steps,
                                                  stochastic=True))
        mk = lambda k: jax.vmap(scn.init_state)(jax.random.split(k, batch))

    # true-dependency warm fence (fire-ahead acks make block_until_ready
    # unreliable on the remote runtime)
    _ = float(run(mk(jax.random.PRNGKey(0))).num_peds.sum())
    times = []
    for i in range(3):
        st = mk(jax.random.PRNGKey(seed0 + i))
        np.asarray(st.density)  # host materialization fence
        t0 = time.time()
        out = run(st)
        # device-side checksum: a true data dependency without timing the
        # full-array transfer through the SSH tunnel
        _ = float(out.num_peds.sum())
        times.append(time.time() - t0)
    return steps * batch / min(times)


def main():
    from pednstream_tpu.generator import NetworkEnvGenerator
    from pednstream_tpu.scenario import build_scenario

    results = {}
    for name, batch, steps in (("melbourne", 512, 100), ("grid_50x50", 32, 100)):
        gen = NetworkEnvGenerator()
        data = gen.load_network_data(name)
        base = dict(history_window=64, binomial_mode="fast")
        for label, extra in (("xla", {}), ("pallas", {"use_pallas": True})):
            scn = build_scenario(
                data["adjacency_matrix"], gen.config["params"],
                gen.config["origin_nodes"], gen.config["destination_nodes"],
                **base, **extra,
            )
            key = f"{name}/B{batch}/{label}"
            results[key] = round(measure(scn, batch, steps), 0)
            print(f"{key}: {results[key]:.0f} env-steps/s", flush=True)

    # single-replica latency variants (melbourne, the interactive path)
    gen = NetworkEnvGenerator()
    data = gen.load_network_data("melbourne")
    variants = {
        "exact-full": {},
        "fastbinom-full": {"binomial_mode": "fast"},
        "fastbinom-win64": {"binomial_mode": "fast", "history_window": 64},
        "fastbinom-win64-pallas": {"binomial_mode": "fast",
                                   "history_window": 64, "use_pallas": True},
    }
    for label, kw in variants.items():
        scn = build_scenario(
            data["adjacency_matrix"], gen.config["params"],
            gen.config["origin_nodes"], gen.config["destination_nodes"], **kw,
        )
        key = f"melbourne/B1/{label}"
        results[key] = round(measure(scn, 1, 499), 0)
        print(f"{key}: {results[key]:.0f} steps/s", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
