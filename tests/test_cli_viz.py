"""CLI end-to-end + visualization export tests."""

import json
import os

import numpy as np

from mesh_navigation_tpu.utils import viz


def test_rainbow_colormap_contract():
    """Parity with mesh_map::getRainbowColor (util.cpp:411-433)."""
    # value 0 -> (n=0 -> r=0? ) compute reference by scalar port:
    def ref(value):
        if not np.isfinite(value):
            return (0.0, 0.0, 0.0)
        value = min(max(value, 0.0), 1.0)
        h = value * 5.0 + 1.0
        i = int(np.floor(h))
        f = h - i
        if not (i & 1):
            f = 1 - f
        n = 1 - f
        if i <= 1:
            return (n, 0, 1)
        if i == 2:
            return (0, n, 1)
        if i == 3:
            return (0, 1, n)
        if i == 4:
            return (n, 1, 0)
        return (1, n, 0)

    vals = np.asarray([0.0, 0.1, 0.25, 0.4, 0.5, 0.66, 0.8, 0.99, 1.0, np.nan, np.inf])
    got = viz.rainbow_color(vals)
    want = np.asarray([ref(v) for v in vals])
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_exports(tmp_path, grid_mesh_small):
    m = grid_mesh_small
    costs = np.linspace(0, 1, m.num_vertices)
    p = tmp_path / "c.ply"
    viz.write_cost_ply(str(p), np.asarray(m.vertices), np.asarray(m.faces), costs)
    txt = p.read_text()
    assert "element vertex 64" in txt and "end_header" in txt

    vf = np.tile([1.0, 0, 0], (m.num_vertices, 1))
    p2 = tmp_path / "vf.obj"
    viz.write_vector_field_obj(str(p2), np.asarray(m.vertices), vf)
    assert p2.read_text().count("l ") == 64

    p3 = tmp_path / "path.obj"
    viz.write_path_obj(str(p3), np.asarray(m.vertices[:5]), np.ones(5, bool))
    assert "l 1 2 3 4 5" in p3.read_text()


def test_cli_end_to_end(tmp_path, capsys):
    from mesh_navigation_tpu.cli import main

    out = tmp_path / "nav"
    rc = main([
        "--synthetic", "16", "--start", "1", "1", "0", "--goal", "5", "5", "0",
        "--planner", "dijkstra", "--layers", "steepness",
        "--out", str(out),
    ])
    captured = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(captured)
    assert rc == 0
    assert data["outcome"] == "SUCCESS"
    assert data["cost"] > 5.0
    assert os.path.exists(out / "potential.ply")
    assert os.path.exists(out / "path.obj")
