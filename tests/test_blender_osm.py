"""Blender OSM stage: generated-script features (no Blender needed) +
a gated integration run when Blender is present.

The bpy script is generated host-side (build_blender_script), so the
reference-parity features — addon bootstrap, material-by-name
assignment, tiered road processing with bounds trim, bbox-sized terrain
plane, per-class exports, origin metadata (reference
deepmimo/pipelines/utils/blender_utils.py:73-555) — are pinned here as
unit tests on the script text and its compiled AST.
"""

import ast
import os

import numpy as np
import pytest

from deepmimo_tpu.pipelines.blender_osm import (
    build_blender_script, fetch_osm_scene, find_blender,
    xy_bounds_from_bbox, MATERIALS, ROAD_TIERS, BlenderNotAvailable)

BBOX = (40.68503298, -73.84682129, 40.68597435, -73.84336302)


def test_script_is_valid_python(tmp_path):
    src = build_blender_script(BBOX, str(tmp_path))
    ast.parse(src)                       # syntax-checks the whole script
    src_sionna = build_blender_script(BBOX, str(tmp_path),
                                      formats=("insite", "sionna"))
    ast.parse(src_sionna)


def test_script_features(tmp_path):
    src = build_blender_script(BBOX, str(tmp_path))

    # Materials created by ITU name and assigned by object-name pattern
    assert "itu_concrete" in src and "itu_brick" in src \
        and "itu_wet_ground" in src
    assert "assign_material_by_pattern" in src
    assert '"building"' in src

    # Tiered road selection + rejection keywords + bounds trim
    assert "map.osm_roads_primary" in src
    assert "map.osm_paths_footway" in src
    assert "profile_" in src and "paths_steps" in src
    assert "trim_to_bounds" in src and "INTERSECT" in src

    # Terrain plane sized from the bbox (NOT a unit plane): the baked
    # TERRAIN_SIZE must match the haversine bbox extent x1.2.
    from deepmimo_tpu.pipelines.geo_utils import bbox_size_meters
    sx, sy = bbox_size_meters(BBOX)
    assert f"({sx * 1.2!r}, {sy * 1.2!r})" in src
    assert sx > 100 and sy > 50          # sanity: a real city block
    assert 'plane.name = "terrain"' in src

    # Addon bootstrap + blosm configuration
    assert "ensure_addon" in src and "addon_install" in src
    assert "blosm.zip" in src
    assert "3Dsimple" in src and "ignoreGeoreferencing" in src

    # OSM origin + bbox metadata persisted for downstream georeferencing
    assert "osm_gps_origin.txt" in src and "scenario_info.txt" in src

    # Per-class exports so the InSite conversion sees separate meshes
    for pattern in ("building", "road", "terrain"):
        assert f'export_class_ply("{pattern}")' in src

    # Mitsuba export only for the sionna format
    assert "WANT_SIONNA = False" in src
    src2 = build_blender_script(BBOX, str(tmp_path),
                                formats=("insite", "sionna"))
    assert "WANT_SIONNA = True" in src2
    assert "mitsuba-blender" in src2 and "export_scene.mitsuba" in src2


def test_xy_bounds_centered_and_padded():
    min_x, max_x, min_y, max_y = xy_bounds_from_bbox(BBOX)
    assert min_x == -max_x and min_y == -max_y      # centered frame
    from deepmimo_tpu.pipelines.geo_utils import bbox_size_meters
    sx, sy = bbox_size_meters(BBOX)
    np.testing.assert_allclose(max_x - min_x, sx, rtol=1e-6)
    np.testing.assert_allclose(max_y - min_y, sy, rtol=1e-6)
    p = xy_bounds_from_bbox(BBOX, pad_m=40.0)
    np.testing.assert_allclose(p[1] - p[0], sx + 80.0, rtol=1e-6)


def test_fetch_skips_existing(tmp_path):
    """Resumable pipelines: an existing buildings.ply short-circuits
    before Blender is even looked up."""
    (tmp_path / "buildings.ply").write_text("ply")
    out = fetch_osm_scene(BBOX, str(tmp_path))
    assert out == str(tmp_path)


def test_fetch_raises_without_blender(tmp_path, monkeypatch):
    monkeypatch.delenv("BLENDER_PATH", raising=False)
    monkeypatch.setenv("PATH", "")
    with pytest.raises(BlenderNotAvailable):
        fetch_osm_scene(BBOX, str(tmp_path / "new"))


def test_constants_cover_reference_surface():
    assert set(MATERIALS) == {"building", "road", "terrain"}
    assert len(ROAD_TIERS) >= 2 and all(len(t) > 0 for t in ROAD_TIERS)


@pytest.mark.skipif(find_blender() is None,
                    reason="Blender not installed")
def test_blender_integration(tmp_path):
    """Gated: executes the generated script in a real headless Blender.
    (Needs the blosm addon + network for OSM tiles; kept opt-in.)"""
    if not os.environ.get("DM_TEST_BLENDER"):
        pytest.skip("set DM_TEST_BLENDER=1 to run the full Blender pass")
    out = fetch_osm_scene(BBOX, str(tmp_path / "scene"))
    assert os.path.exists(os.path.join(out, "buildings.ply"))
    assert os.path.exists(os.path.join(out, "osm_gps_origin.txt"))
