"""MATLAB generator package: structural + exporter-contract consistency.

No MATLAB/Octave runtime exists in this environment (same situation as the
reference repo, which ships its MATLAB port untested), so these tests pin
the mechanical contracts instead: the .m files must read exactly the
layout deepmimo_tpu.integrations.export_matlab writes (file names, row
indices, dBm re-referencing), and the MATLAB sources must be structurally
sound (balanced function/end, every called helper shipped).
"""

import os
import re

import numpy as np
import pytest

M_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "deepmimo_tpu", "integrations", "matlab")

EXPECTED = ["DeepMIMO_TPU_generate.m", "read_v3_scenario.m",
            "construct_channel.m", "rotate_angles.m", "array_response.m",
            "fov_mask.m", "antenna_pattern.m", "default_params.m"]


def _read(name):
    with open(os.path.join(M_DIR, name)) as f:
        return f.read()


def test_matlab_files_shipped():
    for name in EXPECTED:
        assert os.path.exists(os.path.join(M_DIR, name)), name


def test_matlab_function_end_balance():
    """Every function opens and closes; no stray block keywords."""
    opener = re.compile(r"^\s*(function|if|for|while|switch)\b")
    # Block-closing `end` only: not the indexing keyword (x(end), {end+1}).
    closer = re.compile(r"(?<![\w.(\{,+\-])\bend\b(?!\s*[+\-*\)\}:,\w])")
    for name in EXPECTED:
        src = _read(name)
        n_open = n_close = 0
        for line in src.splitlines():
            code = line.split("%")[0]
            code = re.sub(r"[\(\{][^()\{\}]*[\)\}]", "", code)  # drop idx
            if opener.match(code):
                n_open += 1
            n_close += len(closer.findall(code))
        assert n_open == n_close, f"{name}: {n_open} opens, {n_close} ends"


def test_matlab_helpers_all_shipped():
    """Every non-builtin function call in the package resolves to a
    shipped .m file (or a local subfunction)."""
    shipped = {n[:-2] for n in EXPECTED}
    local = set()
    calls = set()
    fn_def = re.compile(r"^function\s+(?:\[?[\w,\s~]*\]?\s*=\s*)?(\w+)",
                        re.M)
    for name in EXPECTED:
        src = _read(name)
        local |= set(fn_def.findall(src))
        for helper in ("construct_channel", "rotate_angles",
                       "array_response", "fov_mask", "antenna_pattern",
                       "default_params", "squeeze4", "read_v3_scenario",
                       "load_meta"):
            if re.search(rf"\b{helper}\s*\(", src):
                calls.add(helper)
    assert calls <= (shipped | local), calls - (shipped | local)


def test_matlab_row_indices_match_exporter():
    """construct_channel.m's pm(row,:) indexing must match the row order
    export_matlab writes (matlab_export.py mat[i] assignments, 0-based)."""
    import inspect
    from deepmimo_tpu.integrations import matlab_export

    src_py = inspect.getsource(matlab_export)
    py_rows = {
        "phase": int(re.search(r"mat\[(\d+)\] = phase", src_py).group(1)),
        "delay": int(re.search(r"mat\[(\d+)\] = delay", src_py).group(1)),
        "power": int(re.search(r"mat\[(\d+)\] = power", src_py).group(1)),
        "aoa_az": int(re.search(r"mat\[(\d+)\] = aoa_az", src_py).group(1)),
        "aoa_el": int(re.search(r"mat\[(\d+)\] = aoa_el", src_py).group(1)),
        "aod_az": int(re.search(r"mat\[(\d+)\] = aod_az", src_py).group(1)),
        "aod_el": int(re.search(r"mat\[(\d+)\] = aod_el", src_py).group(1)),
        "dop_v": int(re.search(r"mat\[(\d+)\] = dop_v", src_py).group(1)),
        "dop_a": int(re.search(r"mat\[(\d+)\] = dop_a", src_py).group(1)),
    }

    src_m = _read("construct_channel.m")
    m_rows = {
        "phase": int(re.search(r"phase_deg = pm\((\d+)", src_m).group(1)),
        "delay": int(re.search(r"delay_s = pm\((\d+)", src_m).group(1)),
        "power": int(re.search(r"power_dbw = pm\((\d+)", src_m).group(1)),
        "aoa_az": int(re.search(r"aoa_az = pm\((\d+)", src_m).group(1)),
        "aoa_el": int(re.search(r"aoa_el = pm\((\d+)", src_m).group(1)),
        "aod_az": int(re.search(r"aod_az = pm\((\d+)", src_m).group(1)),
        "aod_el": int(re.search(r"aod_el = pm\((\d+)", src_m).group(1)),
        "dop_v": int(re.search(r"dop_v = pm\((\d+)", src_m).group(1)),
        "dop_a": int(re.search(r"dop_a = pm\((\d+)", src_m).group(1)),
    }
    for key, row0 in py_rows.items():
        assert m_rows[key] == row0 + 1, (key, row0, m_rows[key])
    # dBm -> dBW inversion: the .m subtracts the exported transmit_power.
    assert re.search(r"pm\(3, :\) - tx_power", src_m)


def test_matlab_reads_what_exporter_writes(tmp_path):
    """Export a real (synthetic) Dataset and check the file inventory the
    .m entry point loads is exactly what lands on disk."""
    scipy_io = pytest.importorskip("scipy.io")
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scenario_utils import write_synthetic_scenario
    import deepmimo_tpu as dm
    from deepmimo_tpu.integrations import export_matlab

    name = "matlab_gen_fixture"
    root = tmp_path / "deepmimo_scenarios"
    write_synthetic_scenario(str(root / name), n_ue=12, max_paths=5,
                             grid=(4, 3))
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        ds = dm.load(name)
    finally:
        os.chdir(old)
    out = str(tmp_path / "matlab_out")
    export_matlab(ds, out, tx_power_dbm=30.0)

    files = set(os.listdir(out))
    # file handling lives in the reader; the entry point delegates to it
    src_m = _read("DeepMIMO_TPU_generate.m") + _read("read_v3_scenario.m")
    assert "params.mat" in files and "params.mat" in src_m
    assert "UE_locations.mat" in files and "UE_locations.mat" in src_m
    assert "BS1_BS.mat" in files and "BS%d_BS.mat" in src_m
    assert any(re.match(r"BS1_UE_\d+-\d+\.mat", f) for f in files)
    assert "BS%d_UE_%%d-%%d.mat" in src_m or "BS%d_UE_*" in src_m

    # The exported params.mat carries every field the .m consumes.
    meta = scipy_io.loadmat(os.path.join(out, "params.mat"))
    for field in ("num_BS", "transmit_power", "carrier_freq",
                  "doppler_available"):
        assert field in meta, field
        assert re.search(rf"\b{field}\b", src_m) or \
            re.search(rf"\b{field}\b", _read("construct_channel.m")), field

    # Round-trip sanity on a chunk: rows x paths, finite, dBm offset.
    chunk = scipy_io.loadmat(os.path.join(out, "BS1_UE_0-12.mat"),
                             squeeze_me=False)
    pm = chunk["channels"][0][0][0][0][0]   # cell -> struct -> field 'p'
    assert pm.shape[0] in (8, 10)
    p_dbw = np.asarray(ds.power[0])
    p_dbw = p_dbw[~np.isnan(p_dbw)]
    np.testing.assert_allclose(pm[2, :len(p_dbw)], p_dbw + 30.0, atol=1e-9)


def test_read_v3_scenario_contract():
    """read_v3_scenario.m consumes the published v3 layout standalone:
    struct cells (channels{u}.p), dual-polar blocks, rx_locs/tx_loc with
    the same fallbacks as converter/legacy_v3.py."""
    src = _read("read_v3_scenario.m")
    # canonical struct-cell access (the upstream MATLAB contract,
    # reference read_raytracing_v3.m:76-80) + bare-matrix acceptance
    assert re.search(r"isstruct\(pm\), pm = pm\.p", src)
    # dual-polar block selection
    assert "channels_" in src and "dual_polar_available" in src
    # chunk-file naming + ordering
    assert "BS%d_UE_%%d-%%d.mat" in src
    # location fallbacks mirror converter/legacy_v3.py: chunk rx_locs /
    # tx_loc first, then BS{i}_BS.mat / UE_locations.mat
    for token in ("rx_locs", "tx_loc", "BS%d_BS.mat", "UE_locations.mat",
                  "BS_loc"):
        assert token in src, token
    # <name>.params.mat naming accepted (published scenarios use it)
    assert "*params.mat" in src


def test_generate_consumes_reader():
    src = _read("DeepMIMO_TPU_generate.m")
    assert re.search(r"read_v3_scenario\s*\(", src)


def test_reader_row_semantics_match_python_loader():
    """The .m docstring's row order must match what converter/legacy_v3.py
    extracts (mat[0]=phase ... mat[9]=dop_acc, 0-based)."""
    import inspect
    from deepmimo_tpu.converter import legacy_v3

    src_py = inspect.getsource(legacy_v3)
    # python loader rows (0-based): phase 0, delay 1, power 2, aoa 3/4,
    # aod 5/6, LoS 7, doppler 8/9
    assert re.search(r"PHASE_PARAM_NAME\]\[u, :n_p\] = mat\[0", src_py)
    assert re.search(r"DELAY_PARAM_NAME\]\[u, :n_p\] = mat\[1", src_py)
    assert re.search(r"POWER_PARAM_NAME\]\[u, :n_p\] = mat\[2", src_py)
    src_m = _read("read_v3_scenario.m")
    # the .m documents the same 1-based order
    assert re.search(r"phase\(deg\); ToA\(s\); power\(dBm\)", src_m)
