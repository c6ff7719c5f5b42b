"""Topology compiler unit tests: node typing, slot alignment, reverse
permutation — mirrors the reference object graph rules
(network.py:141-167, 194-248; node.py:28-54)."""

import numpy as np

from pednstream_tpu.topology import build_topology


def _chain(n):
    adj = np.zeros((n, n), dtype=int)
    for i in range(n - 1):
        adj[i, i + 1] = adj[i + 1, i] = 1
    return adj


PARAMS = {
    "simulation_steps": 10,
    "unit_time": 10,
    "default_link": {
        "length": 100, "width": 2, "free_flow_speed": 1.1,
        "k_critical": 2, "k_jam": 6,
    },
}


def test_chain_topology():
    topo = build_topology(_chain(4), PARAMS, [0], [3])
    assert topo.n_links == 6  # 3 corridors * 2 directions
    # endpoints: degree 1 -> OneToOne with virtual pair
    assert topo.is_otoo[0] and topo.has_virtual[0]
    assert topo.is_otoo[3] and topo.has_virtual[3]
    # interior: degree 2, not O/D -> OneToOne without virtual
    assert topo.is_otoo[1] and not topo.has_virtual[1]
    # reverse permutation is an involution pairing (u,v) with (v,u)
    for e, (u, v) in enumerate(topo.link_nodes):
        r = topo.reverse_idx[e]
        assert tuple(topo.link_nodes[r]) == (v, u)
        assert topo.reverse_idx[r] == e


def test_slot_alignment():
    # star: center 0 connected to 1..4; node 0 is Regular
    adj = np.zeros((5, 5), dtype=int)
    for j in range(1, 5):
        adj[0, j] = adj[j, 0] = 1
    topo = build_topology(adj, PARAMS, [1], [4])
    assert not topo.is_otoo[0]
    assert topo.node_arity[0] == 4
    # in/out slot k of a node must reference the same neighbour
    for n in range(5):
        for k in range(topo.max_deg):
            ii, oo = topo.in_link_idx[n, k], topo.out_link_idx[n, k]
            if ii >= 0 and oo >= 0:
                assert topo.link_nodes[ii][0] == topo.link_nodes[oo][1]


def test_degree2_od_is_regular_with_virtual():
    # chain interior node that is also an origin (network.py:154-158)
    topo = build_topology(_chain(4), PARAMS, [1], [3])
    assert not topo.is_otoo[1]
    assert topo.has_virtual[1]
    assert topo.node_arity[1] == 3


def test_inverse_maps():
    topo = build_topology(_chain(5), PARAMS, [0], [4])
    for e in range(topo.n_links):
        u, v = topo.link_nodes[e]
        assert topo.start_node[e] == u and topo.end_node[e] == v
        assert topo.in_link_idx[v, topo.end_slot[e]] == e
        assert topo.out_link_idx[u, topo.start_slot[e]] == e


def test_separator_flag():
    params = dict(PARAMS)
    params["controllers"] = {"enabled": True, "links": ["1-2"]}
    topo = build_topology(_chain(4), params, [0], [3])
    e12 = topo.link_id_to_idx[(1, 2)]
    e21 = topo.link_id_to_idx[(2, 1)]
    assert topo.link_params.is_separator[e12]
    assert topo.link_params.is_separator[e21]
    assert not topo.link_params.is_separator[topo.link_id_to_idx[(0, 1)]]
