"""Smoke tests: matplotlib plotting paths + database client vs mock server."""

import json
import os
import threading

import numpy as np
import pytest

import matplotlib
matplotlib.use("Agg")

import deepmimo_tpu as dm
from deepmimo_tpu import consts as c
from scenario_utils import write_synthetic_scenario


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    folder = str(tmp_path_factory.mktemp("viz") / "viz_city")
    write_synthetic_scenario(folder, n_ue=16, max_paths=6, seed=55,
                             grid=(4, 4))
    return dm.load(folder)


def test_plot_coverage(dataset):
    ax = dataset.plot_coverage(np.asarray(dataset.pathloss),
                               cbar_title="PL (dB)")
    assert ax is not None
    import matplotlib.pyplot as plt
    plt.close("all")


def test_plot_rays(dataset):
    idx = int(np.argmax(np.asarray(dataset.num_paths)))
    ax = dataset.plot_rays(idx)
    assert ax is not None
    import matplotlib.pyplot as plt
    plt.close("all")


def test_plot_power_discarding(dataset):
    dataset.compute_channels(dm.ChannelGenParameters())
    ax = dm.plot_power_discarding(dataset)
    assert ax is not None
    import matplotlib.pyplot as plt
    plt.close("all")


def test_scene_plot():
    from deepmimo_tpu.scene import Scene, Face, PhysicalElement
    scene = Scene()
    scene.add_object(PhysicalElement(
        [Face([[0, 0, 0], [5, 0, 0], [5, 5, 0], [0, 5, 0]])],
        label="buildings"))
    ax = scene.plot()
    assert ax is not None
    ax2 = scene.plot(proj_2d=True)
    assert ax2 is not None
    import matplotlib.pyplot as plt
    plt.close("all")


def test_plot_summary(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    folder = str(tmp_path / "deepmimo_scenarios" / "ps_scen")
    write_synthetic_scenario(folder, n_ue=8, max_paths=4, seed=56,
                             grid=(4, 2))
    paths = dm.plot_summary("ps_scen", save_imgs=True, show_plots=False)
    assert paths and all(os.path.exists(p) for p in paths)


# ----------------------------------------------------------------------------
# Database client against a local mock server
# ----------------------------------------------------------------------------

class _MockHandler:
    """Minimal scenario-database server for client tests."""

    def __init__(self):
        from http.server import BaseHTTPRequestHandler

        received = self.received = {}

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _json(self, obj, code=200):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path.startswith("/api/presign"):
                    port = self.server.server_address[1]
                    self._json({"url":
                                f"http://127.0.0.1:{port}/storage/put"})
                elif self.path.startswith("/api/download"):
                    port = self.server.server_address[1]
                    self._json({"url":
                                f"http://127.0.0.1:{port}/storage/get"})
                elif self.path.startswith("/storage/get"):
                    data = received.get("zip", b"")
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                else:
                    self._json({"error": "not found"}, 404)

            def do_PUT(self):
                length = int(self.headers.get("Content-Length", 0))
                received["zip"] = self.rfile.read(length)
                self._json({"ok": True})

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                if self.path.startswith("/api/submissions"):
                    received["submission"] = json.loads(body)
                    self._json({"id": 42, "status": "created"})
                elif self.path.startswith("/api/search"):
                    received["query"] = json.loads(body)
                    self._json({"scenarios": ["city_a", "city_b"]})
                elif self.path.startswith("/api/images"):
                    received.setdefault("images", []).append(self.path)
                    self._json({"ok": True})
                else:
                    self._json({"error": "not found"}, 404)

        self.handler_cls = Handler


@pytest.fixture()
def mock_server():
    from http.server import ThreadingHTTPServer

    mock = _MockHandler()
    server = ThreadingHTTPServer(("127.0.0.1", 0), mock.handler_cls)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    old = dm.config.get("api_endpoint")
    dm.config.set("api_endpoint",
                  f"http://127.0.0.1:{server.server_address[1]}")
    yield mock
    dm.config.set("api_endpoint", old)
    server.shutdown()


def test_upload_download_search(tmp_path, monkeypatch, mock_server):
    monkeypatch.chdir(tmp_path)
    folder = str(tmp_path / "deepmimo_scenarios" / "api_scen")
    write_synthetic_scenario(folder, n_ue=8, max_paths=4, seed=57,
                             grid=(4, 2))

    # upload: zip -> presign -> PUT -> submission
    result = dm.upload("api_scen", key="test-key", include_images=False)
    assert result["id"] == 42
    assert mock_server.received["submission"]["scenario"] == "api_scen"
    assert len(mock_server.received["zip"]) > 1000

    # website key components ride the submission (reference api.py:277-360)
    kc = mock_server.received["submission"]["key_components"]
    names = [sec["name"] for sec in kc["sections"]]
    assert "Ray-Tracing Configuration" in names
    assert "TX/RX Configuration" in names
    assert all("<div class=\"section-content\">" in sec["description"]
               for sec in kc["sections"])

    # search
    names = dm.search({"environment": "outdoor"})
    assert names == ["city_a", "city_b"]
    assert mock_server.received["query"]["environment"] == "outdoor"

    # download: token -> fetch zip -> unzip into scenarios dir
    import shutil
    shutil.rmtree(folder)
    out = dm.download("api_scen")
    assert os.path.isdir(out)
    ds = dm.load(os.path.join(out, "api_scen"))
    assert ds.n_ue == 8


def test_api_error_offline(monkeypatch):
    from deepmimo_tpu.api import ApiError
    dm.config.set("api_endpoint", "http://127.0.0.1:1")  # closed port
    try:
        with pytest.raises(ApiError):
            dm.search({"q": 1})
    finally:
        dm.config.set("api_endpoint", "https://dev.deepmimo.net")



def test_key_components_match_reference_parser(tmp_path, monkeypatch):
    """Our summary->key-components pipeline produces the same payload
    structure the reference's parser would (whitespace-insensitive), so
    database-side search indexes identically."""
    import re
    import sys

    monkeypatch.chdir(tmp_path)
    folder = str(tmp_path / "deepmimo_scenarios" / "kc_scen")
    write_synthetic_scenario(folder, n_ue=8, max_paths=4, seed=3,
                             grid=(4, 2))
    text = dm.summary("kc_scen", print_summary=False)

    from deepmimo_tpu.api import generate_key_components
    ours = generate_key_components(text)

    sys.path.insert(0, "/root/reference")
    try:
        for mod in list(sys.modules):
            if mod == "deepmimo" or mod.startswith("deepmimo."):
                del sys.modules[mod]
        from deepmimo.api import _generate_key_components as ref_parse
        theirs = ref_parse(text)
    finally:
        sys.path.remove("/root/reference")
        for mod in list(sys.modules):
            if mod == "deepmimo" or mod.startswith("deepmimo."):
                del sys.modules[mod]

    norm = lambda h: re.sub(r">\s+<", "><",
                            re.sub(r"\s+", " ", h)).strip()
    assert [s_["name"] for s_ in ours["sections"]] == \
        [s_["name"] for s_ in theirs["sections"]]
    for a, b in zip(ours["sections"], theirs["sections"]):
        assert norm(a["description"]) == norm(b["description"]), a["name"]
