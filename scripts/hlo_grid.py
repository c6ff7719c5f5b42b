"""Dump source metadata for the hottest fusions of the grid batched step
(maps profiler fusion names -> engine source lines).

Run: PROF_B=256 python scripts/hlo_grid.py > /tmp/hlo_grid.log 2>&1
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("PROF_B", "256"))
H = int(os.environ.get("PROF_H", "32"))
IMPL = os.environ.get("PROF_IMPL", "threefry2x32")  # bench path: unsafe_rbg
# defaults track the current hot-op names (the variadic lax.reduce pass
# merged the old select_reduce/multiply_reduce sibling pair); pass
# HLO_NAMES from a fresh scripts/profile_grid.py run for exact names
NAMES = [n.strip() for n in os.environ.get(
    "HLO_NAMES",
    "multiply_reduce_fusion.4,broadcast_multiply_fusion.7,fusion.224,"
    "fusion.239,fusion.249,fusion.230",
).split(",")]


def main():
    import jax

    from pednstream_tpu.engine import simulate_batched
    from pednstream_tpu.generator import NetworkEnvGenerator
    from pednstream_tpu.scenario import build_scenario

    gen = NetworkEnvGenerator()
    data = gen.load_network_data("grid_50x50")
    scn = build_scenario(
        data["adjacency_matrix"], gen.config["params"],
        gen.config["origin_nodes"], gen.config["destination_nodes"],
        history_window=H, binomial_mode="fast",
    )
    ep = scn.engine_params
    fn = jax.jit(lambda ss: simulate_batched(scn, ep, ss, 100,
                                             stochastic=True))
    states = jax.vmap(scn.init_state)(
        jax.random.split(jax.random.key(0, impl=IMPL), B))
    txt = fn.lower(states).compile().as_text()
    # print each requested fusion's computation header + first lines with metadata
    for name in NAMES:
        pat = re.compile(rf"^\s*%?{re.escape(name)} = .*$", re.M)
        m = pat.search(txt)
        if not m:
            print(f"--- {name}: NOT FOUND")
            continue
        line = m.group(0)
        print(f"--- {name}:")
        print(line[:400])
        cm = re.search(r"calls=([%\w.\-]+)", line)
        if cm:
            comp = cm.group(1).lstrip("%")
            cpat = re.compile(rf"^([ \t]*)%?{re.escape(comp)} ", re.M)
            cm2 = cpat.search(txt)
            if cm2:
                start = txt.rfind("\n", 0, cm2.start()) + 1
                # computation body: until matching closing brace at col 0-ish
                seg = txt[start:start + 20000]
                metas = re.findall(r'op_name="([^"]+)"[^\n]*?'
                                   r'source_file="([^"]+)"[^\n]*?source_line=(\d+)',
                                   seg)
                seen = set()
                for op, f, l in metas:
                    key = (f, l)
                    if key in seen:
                        continue
                    seen.add(key)
                    print(f"    {f.split('/')[-1]}:{l}  {op[:120]}")
        print()


if __name__ == "__main__":
    main()
