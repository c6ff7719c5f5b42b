"""MCP service-layer tests: end-to-end workflow (create -> run -> save ->
visualize -> config authoring round trip, reference mcp/run_mcp.py role),
legacy-key config normalization (mcp_server.py:564-717), and real tool
parameter schemas in the agent client."""

import numpy as np

from pednstream_tpu.mcp import server
from pednstream_tpu.mcp.run_mcp import run_workflow


def test_mcp_workflow_roundtrip(tmp_path):
    log = run_workflow(steps=20, data_dir=str(tmp_path), verbose=False)
    # config authoring happened and produced a loadable nested config
    assert log["upsert_config"][0]["saved"]
    assert log["read_config"][0]["config"]["simulation"]["simulation_steps"] >= 30
    # resumable stepping hit both chunks
    assert [s["current_step"] for s in log["get_status"]] == [10, 20]
    # jit-cached step survives across run_simulation calls
    sim_id = log["create_environment"][0]["sim_id"]
    assert server._manager.get(sim_id).step_fn is not None
    # outputs + snapshot written
    assert log["save_outputs"][0]["output_dir"]
    assert log["visualize_snapshot"][0]["image_path"].endswith(".png")


def test_normalize_config_legacy_keys():
    # flat loader form (the reference env_loader's internal shape)
    flat = {
        "params": {
            "simulation_steps": 100, "unit_time": 10,
            "path_finder": {"k_paths": 2},
            "default_link": {"length": 50, "width": 3, "free_flow_speed": 1.1,
                             "k_critical": 2, "k_jam": 6},
            "links": {"0_1": {"width": 5}},
        },
        "origin_nodes": [0],
        "destination_nodes": [2],
        "adjacency_matrix": [[0, 1], [1, 0]],
        "od_flows": {"0_2": 5},
    }
    norm = server.normalize_config(flat)
    assert norm["simulation"]["simulation_steps"] == 100
    assert norm["simulation"]["path_finder"] == {"k_paths": 2}
    assert norm["network"]["origin_nodes"] == [0]
    assert norm["network"]["adjacency_matrix"] == [[0, 1], [1, 0]]
    assert norm["default_link"]["k_jam"] == 6
    assert norm["links"] == {"0_1": {"width": 5}}
    assert norm["od_flows"] == {"0_2": 5}

    # nested file form passes through unchanged semantically
    nested = {
        "network": {"origin_nodes": [1], "adjacency_matrix": [[0, 1], [1, 0]]},
        "simulation": {"simulation_steps": 50, "unit_time": 10},
        "default_link": {"length": 50, "width": 3, "free_flow_speed": 1.1,
                         "k_critical": 2, "k_jam": 6},
    }
    norm2 = server.normalize_config(nested)
    assert norm2["network"]["origin_nodes"] == [1]
    assert norm2["simulation"]["unit_time"] == 10

    # validate_config accepts the flat form via normalization
    v = server.validate_config(config=flat)
    assert v["valid"], v["errors"]
    assert "simulation" in v["normalized"]


def test_validate_config_rejects_bad_values():
    bad = {
        "network": {"origin_nodes": [0], "adjacency_matrix": [[0, 1], [1, 0]]},
        "simulation": {"simulation_steps": -5, "unit_time": 10},
        "default_link": {"length": 50, "width": -3, "free_flow_speed": 1.1,
                         "k_critical": 6, "k_jam": 2},
        "links": {"banana": {"width": 1}},
        "od_flows": {"0_1": -4},
    }
    v = server.validate_config(config=bad)
    assert not v["valid"]
    paths = {e["path"] for e in v["errors"]}
    assert "default_link.width" in paths
    assert "default_link.k_jam" in paths
    assert "links.banana" in paths
    assert "od_flows.0_1" in paths
    assert "simulation.simulation_steps" in paths


def test_agent_client_tool_schemas():
    from pednstream_tpu.mcp.agent_client import TOOL_SPECS

    specs = {s["name"]: s for s in TOOL_SPECS}
    assert set(specs) == set(server.TOOLS)
    # every tool with parameters advertises real properties, not {}
    assert "sim_id" in specs["run_simulation"]["parameters"]["properties"]
    assert specs["run_simulation"]["parameters"]["required"] == ["sim_id"]
    assert (specs["create_environment"]["parameters"]["properties"]
            ["config_name"]["type"] == "string")
    assert (specs["run_simulation"]["parameters"]["properties"]
            ["steps"]["type"] == "integer")
    for name in ("create_environment", "visualize_snapshot", "upsert_config"):
        assert specs[name]["parameters"]["properties"], name
        assert specs[name]["description"]


def test_http_transport_smoke():
    """Live-socket HTTP smoke test (role of the reference's
    mcp/test_http_client.py): tool listing with schemas, create -> run ->
    status over POST, resource read over GET."""
    import json as _json
    import urllib.request

    from pednstream_tpu.mcp.http_server import serve

    httpd, _ = serve(port=0, background=True)
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        def get(path):
            with urllib.request.urlopen(base + path, timeout=30) as r:
                return r.status, r.read().decode()

        def post(path, payload):
            req = urllib.request.Request(
                base + path, data=_json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"}, method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, _json.loads(r.read().decode())

        code, body = get("/tools")
        assert code == 200
        tools = {t["name"]: t for t in _json.loads(body)["tools"]}
        assert "run_simulation" in tools
        assert tools["run_simulation"]["parameters"]["properties"]

        code, env = post("/tools/create_environment",
                         {"config_name": "butterfly_scC"})
        assert code == 200 and "sim_id" in env, env
        sim_id = env["sim_id"]
        code, r = post("/tools/run_simulation", {"sim_id": sim_id, "steps": 5})
        assert code == 200 and r["current_step"] == 5, r
        code, st = post("/tools/get_status", {"sim_id": sim_id})
        assert st["status"] in ("CREATED", "RUNNING")

        code, _save = post("/tools/save_outputs", {"sim_id": sim_id})
        code, text = get(f"/resources/sim/{sim_id}/link_data")
        assert code == 200 and text.startswith("{")

        # error paths (urllib raises on non-2xx)
        import urllib.error

        try:
            post("/tools/nonexistent", {})
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()
