"""InSite converter tests: synthetic project folder -> scenario -> channels."""

import os
import shutil
import textwrap

import numpy as np
import pytest

import deepmimo_tpu as dm
from deepmimo_tpu import consts as c
from deepmimo_tpu.config import config
from deepmimo_tpu.converter.insite.p2m import (parse_paths_p2m, parse_pl_p2m,
                                               extract_tx_pos)

TEMPLATE_SETUP = ("/root/reference/deepmimo/pipelines/wireless_insite/"
                  "resources/template.setup")

# Ground-truth paths for the fixture: {rx: [(power, phase, delay, aoa_el,
# aoa_az, aod_el, aod_az, type_str, bounces)]}
FIXTURE_PATHS = {
    0: [(-85.2, 33.1, 1.2e-6, 84.0, 40.3, 90.9, -13.4, "Tx-Rx", []),
        (-97.5, -120.0, 2.5e-6, 70.0, 65.0, 85.0, 30.0, "Tx-R-Rx",
         [(10.0, 5.0, 3.0)])],
    1: [],
    2: [(-110.0, 55.5, 3.1e-6, 95.0, -120.0, 88.0, 170.0, "Tx-R-D-Rx",
         [(12.0, 1.0, 4.0), (-3.0, 8.0, 6.0)])],
    3: [(-92.0, 10.0, 1.9e-6, 60.0, 0.0, 120.0, 45.0, "Tx-DS-Rx",
         [(7.0, 7.0, 2.0)])],
}
TX_POS = (0.0, -10.0, 25.0)
RX_POS = [(0.0, 0.0, 1.5), (1.0, 0.0, 1.5), (0.0, 1.0, 1.5), (1.0, 1.0, 1.5)]


def _paths_p2m_text() -> str:
    lines = [f"# header {i}" for i in range(21)]
    lines.append(str(len(FIXTURE_PATHS)))
    for rx, paths in FIXTURE_PATHS.items():
        lines.append(f"{rx + 1} {len(paths)}")
        if not paths:
            continue
        total_power = max(p[0] for p in paths)
        lines.append(f"{total_power} 0.0 0.0")  # per-rx summary line
        for p_i, (pw, ph, dl, ael, aaz, del_, daz, tstr,
                  bounces) in enumerate(paths):
            lines.append(f"{p_i + 1} {len(bounces)} {pw} {ph} {dl} "
                         f"{ael} {aaz} {del_} {daz}")
            lines.append(tstr)
            lines.append(" ".join(str(v) for v in TX_POS))
            for b in bounces:
                lines.append(" ".join(str(v) for v in b))
            lines.append(" ".join(str(v) for v in RX_POS[rx]))
    return "\n".join(lines) + "\n"


def _pl_p2m_text() -> str:
    lines = ["# <rx> <x> <y> <z> <distance> <pathloss>"]
    for rx, pos in enumerate(RX_POS):
        pl = 250.0 if not FIXTURE_PATHS[rx] else 80.0 + rx
        dist = float(np.linalg.norm(np.array(pos) - np.array(TX_POS)))
        lines.append(f"{rx + 1} {pos[0]:.4f} {pos[1]:.4f} {pos[2]:.4f} "
                     f"{dist:.4f} {pl:.4f}")
    return "\n".join(lines) + "\n"


def _xml_point(x, y, z):
    return f"""<ProjectedPoint>
      <remcom::rxapi::CartesianPoint>
        <X><remcom::rxapi::Double Value="{x}"/></X>
        <Y><remcom::rxapi::Double Value="{y}"/></Y>
        <Z><remcom::rxapi::Double Value="{z}"/></Z>
      </remcom::rxapi::CartesianPoint>
    </ProjectedPoint>"""


def _xml_antenna(kind: str) -> str:
    """Full antenna node (Isotropic + rotations) — required by both our
    txrx reader and the upstream converter's (insite_txrx.py:110-131)."""
    return f"""<{kind}><remcom::rxapi::{kind}>
      <Antenna><remcom::rxapi::Isotropic>
        <Polarization>
          <remcom::rxapi::PolarizationEnum Value="Vertical"/>
        </Polarization>
        <PowerThreshold><remcom::rxapi::Double Value="-250"/></PowerThreshold>
      </remcom::rxapi::Isotropic></Antenna>
      <AntennaRotations><remcom::rxapi::Rotations>
        <Bearing><remcom::rxapi::Double Value="0"/></Bearing>
        <Pitch><remcom::rxapi::Double Value="0"/></Pitch>
        <Roll><remcom::rxapi::Double Value="0"/></Roll>
      </remcom::rxapi::Rotations></AntennaRotations>
      </remcom::rxapi::{kind}></{kind}>"""


def _project_xml() -> str:
    tx = f"""<TxRxSet><remcom::rxapi::PointSet>
      <ControlPoints><remcom::rxapi::ProjectedPointList>
        {_xml_point(*TX_POS)}
      </remcom::rxapi::ProjectedPointList></ControlPoints>
      <OutputID><remcom::rxapi::Integer Value="1"/></OutputID>
      <ShortDescription><remcom::rxapi::String Value="BS"/></ShortDescription>
      {_xml_antenna("Transmitter")}
    </remcom::rxapi::PointSet></TxRxSet>"""
    rx = f"""<TxRxSet><remcom::rxapi::GridSet>
      <ControlPoints><remcom::rxapi::ProjectedPointList>
        {_xml_point(0.0, 0.0, 1.5)}
      </remcom::rxapi::ProjectedPointList></ControlPoints>
      <LengthX><remcom::rxapi::Double Value="1.0"/></LengthX>
      <LengthY><remcom::rxapi::Double Value="1.0"/></LengthY>
      <Spacing><remcom::rxapi::Double Value="1.0"/></Spacing>
      <OutputID><remcom::rxapi::Integer Value="2"/></OutputID>
      <ShortDescription><remcom::rxapi::String Value="users"/>
      </ShortDescription>
      {_xml_antenna("Receiver")}
    </remcom::rxapi::GridSet></TxRxSet>"""
    return f"""<!DOCTYPE InSite>
<InSite version="3.3.0.4">
  <remcom::rxapi::Job>
    <Scene><remcom::rxapi::Scene>
      <TxRxSetList><remcom::rxapi::TxRxSetList>
        {tx}
        {rx}
      </remcom::rxapi::TxRxSetList></TxRxSetList>
    </remcom::rxapi::Scene></Scene>
  </remcom::rxapi::Job>
</InSite>"""


def _city_text() -> str:
    # Two unit-square faces sharing no vertices -> two objects
    return textwrap.dedent("""\
        Format type:keyword version: 1.1.0
        begin_<city> TestCity
        begin_<Material> Concrete
        Material 1
        diffuse_scattering_model lambertian
        fields_diffusively_scattered 0.300000
        begin_<DielectricLayer>
        conductivity 1.000e-02
        permittivity 5.310000
        roughness 0.000e+00
        thickness 0.100000
        end_<DielectricLayer>
        end_<Material>
        begin_<structure_group>
        begin_<structure>
        begin_<sub_structure>
        begin_<face>
        Material 1
        nVertices 4
        0.0000 0.0000 0.0000
        10.0000 0.0000 0.0000
        10.0000 10.0000 0.0000
        0.0000 10.0000 0.0000
        end_<face>
        begin_<face>
        Material 1
        nVertices 3
        20.0000 20.0000 0.0000
        30.0000 20.0000 0.0000
        25.0000 30.0000 5.0000
        end_<face>
        end_<sub_structure>
        end_<structure>
        end_<structure_group>
        end_<city>
        """)


@pytest.fixture()
def insite_project(tmp_path):
    proj = tmp_path / "canyon"
    study = proj / "study_area"
    study.mkdir(parents=True)
    shutil.copy(TEMPLATE_SETUP, proj / "canyon.setup")
    (proj / "canyon.xml").write_text(_project_xml())
    (proj / "canyon.city").write_text(_city_text())
    (study / "canyon.paths.t001_01.r002.p2m").write_text(_paths_p2m_text())
    (study / "canyon.pl.t001_01.r002.p2m").write_text(_pl_p2m_text())
    return str(proj)


def _check_parsed(data):
    assert data[c.POWER_PARAM_NAME].shape[0] == 4
    np.testing.assert_allclose(data[c.POWER_PARAM_NAME][0, :2],
                               [-85.2, -97.5], rtol=1e-6)
    np.testing.assert_allclose(data[c.DELAY_PARAM_NAME][2, 0], 3.1e-6,
                               rtol=1e-6)
    assert np.isnan(data[c.POWER_PARAM_NAME][1]).all()
    # Interaction codes: LoS=0, R=1, RD=12, DS(scatter)=3
    assert data[c.INTERACTIONS_PARAM_NAME][0, 0] == 0
    assert data[c.INTERACTIONS_PARAM_NAME][0, 1] == 1
    assert data[c.INTERACTIONS_PARAM_NAME][2, 0] == 12
    assert data[c.INTERACTIONS_PARAM_NAME][3, 0] == 3
    # Bounce positions
    np.testing.assert_allclose(
        data[c.INTERACTIONS_POS_PARAM_NAME][2, 0, 1], [-3.0, 8.0, 6.0],
        rtol=1e-6)


def test_p2m_python_parser(insite_project):
    f = os.path.join(insite_project, "study_area",
                     "canyon.paths.t001_01.r002.p2m")
    _check_parsed(parse_paths_p2m(f, use_native=False))
    np.testing.assert_allclose(extract_tx_pos(f), TX_POS)


def test_p2m_native_parser_matches_python(insite_project):
    from deepmimo_tpu.native import p2m_native
    if not p2m_native.available():
        pytest.skip("native parser unavailable (no g++)")
    f = os.path.join(insite_project, "study_area",
                     "canyon.paths.t001_01.r002.p2m")
    py = parse_paths_p2m(f, use_native=False)
    nat = parse_paths_p2m(f, use_native=True)
    for key in py:
        np.testing.assert_allclose(py[key], nat[key], rtol=1e-6,
                                   equal_nan=True, err_msg=key)
    _check_parsed(nat)


def test_pl_parser(insite_project):
    f = os.path.join(insite_project, "study_area",
                     "canyon.pl.t001_01.r002.p2m")
    xyz, dist, pl = parse_pl_p2m(f)
    np.testing.assert_allclose(xyz, RX_POS, rtol=1e-5)
    assert pl[1, 0] == 250.0


def test_full_insite_conversion_and_load(insite_project, tmp_path,
                                         monkeypatch):
    monkeypatch.chdir(tmp_path)
    scen_name = dm.convert(insite_project, overwrite=True,
                           scenario_name="canyon_scen")
    assert scen_name == "canyon_scen"

    ds = dm.load("canyon_scen")
    assert ds.n_ue == 4
    _check_parsed({k: np.asarray(ds[k]) for k in
                   (c.POWER_PARAM_NAME, c.DELAY_PARAM_NAME,
                    c.INTERACTIONS_PARAM_NAME,
                    c.INTERACTIONS_POS_PARAM_NAME)})
    np.testing.assert_allclose(np.asarray(ds.tx_pos).ravel(), TX_POS)
    np.testing.assert_allclose(np.asarray(ds.rx_pos), RX_POS, rtol=1e-5)

    # txrx metadata: 4 points, 3 active (rx 1 has 250 dB pathloss)
    txrx = dm.get_txrx_sets("canyon_scen")
    rx_set = [t for t in txrx if t.is_rx][0]
    assert rx_set.num_points == 4
    assert rx_set.num_active_points == 3

    # rt params came from the .setup
    assert ds.rt_params[c.RT_PARAM_FREQUENCY] == 2.4e9
    assert ds.rt_params[c.RT_PARAM_MAX_REFLECTIONS] == 4

    # materials parsed from the .city
    mats = ds.materials
    assert len(mats) >= 1
    assert abs(mats[0].permittivity - 5.31) < 1e-6
    assert mats[0].scattering_model == "lambertian"

    # scene: two disconnected faces -> two objects, round-tripped from disk
    scene = ds.scene
    assert scene is not None and len(scene.objects) == 2

    # channels compute end-to-end from the converted scenario
    ch = ds.compute_channels(dm.ChannelGenParameters())
    assert ch.shape == (4, 1, 8, 1)
    assert np.isfinite(ch).all()
    # user 1 (no paths) has a zero channel
    assert np.abs(ch[1]).max() == 0
