"""Operational InSite maintenance CLI (reference scripts/ parity).

Covers the consolidated subcommands of scripts/insite_ops_cli.py against
synthetic farm layouts: dry-run leaves everything untouched, --apply
performs exactly the planned operations.
"""

import json
import os

import pytest

from deepmimo_tpu.scripts.insite_ops_cli import (
    clean_city_folders, clean_source_files, main, move_insite_out,
    rename_param_key)


def _mk(path, content=""):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


def _farm(tmp_path):
    base = tmp_path / "farm"
    bbox = base / "bbox_city_40-68_-73-84_40-69_-73-85_x"
    _mk(str(bbox / "insite_28" / "proj.setup"))
    _mk(str(bbox / "insite_28" / "study" / "proj.paths.t001_01.r002.p2m"))
    _mk(str(bbox / "osm" / "buildings.ply"))
    _mk(str(bbox / "parameters.txt"))
    csv_path = tmp_path / "cities.csv"
    csv_path.write_text(
        "name,bbox_minlat,bbox_minlon,bbox_maxlat,bbox_maxlon\n"
        "NewYork,40.68,-73.84,40.69,-73.85\n")
    return str(base), str(bbox), str(csv_path)


def test_clean_city_dry_run_touches_nothing(tmp_path, capsys):
    base, bbox, csv_path = _farm(tmp_path)
    n = clean_city_folders(csv_path, base, suffix="_28", apply=False)
    assert n == 1
    assert os.path.isdir(bbox)                      # nothing renamed
    assert os.path.exists(os.path.join(bbox, "parameters.txt"))
    assert "[dry-run]" in capsys.readouterr().out


def test_clean_city_apply(tmp_path):
    base, bbox, csv_path = _farm(tmp_path)
    n = clean_city_folders(csv_path, base, suffix="_28", apply=True)
    assert n == 1
    target = os.path.join(base, "newyork_28")
    assert os.path.isdir(target) and not os.path.exists(bbox)
    # insite contents hoisted; osm/parameters gone
    assert os.path.exists(os.path.join(target, "proj.setup"))
    assert os.path.exists(os.path.join(
        target, "study", "proj.paths.t001_01.r002.p2m"))
    assert not os.path.exists(os.path.join(target, "osm"))
    assert not os.path.exists(os.path.join(target, "insite_28"))
    assert not os.path.exists(os.path.join(target, "parameters.txt"))


def test_clean_city_missing_bbox_warns(tmp_path, capsys):
    base = tmp_path / "empty"
    base.mkdir()
    csv_path = tmp_path / "c.csv"
    csv_path.write_text(
        "name,bbox_minlat,bbox_minlon,bbox_maxlat,bbox_maxlon\n"
        "Nowhere,1.0,2.0,3.0,4.0\n")
    assert clean_city_folders(str(csv_path), str(base), apply=True) == 0
    assert "WARNING" in capsys.readouterr().out


def test_move_insite_out(tmp_path):
    folder = tmp_path / "scen"
    _mk(str(folder / "insite" / "a.setup"))
    _mk(str(folder / "insite" / "sub" / "b.p2m"))
    assert move_insite_out(str(folder), apply=True)
    assert os.path.exists(str(folder / "a.setup"))
    assert os.path.exists(str(folder / "sub" / "b.p2m"))
    assert not os.path.exists(str(folder / "insite"))
    assert not move_insite_out(str(folder), apply=True)  # idempotent


def test_clean_sources(tmp_path):
    base = tmp_path / "projects"
    proj = base / "city_a"
    _mk(str(proj / "scene.xml"),
        '<x Value="./keep.city"/>\n')
    _mk(str(proj / "scene.diag"))            # matches xml basename: keep
    _mk(str(proj / "stale.diag"))            # stray: delete
    _mk(str(proj / "keep.city"))
    _mk(str(proj / "orphan.ter"))            # unreferenced: delete
    _mk(str(proj / "study" / "p.paths.t001.p2m"))
    _mk(str(proj / "study" / "p.pl.t001.p2m"))
    _mk(str(proj / "study" / "p.doa.t001.p2m"))   # not paths/pl: delete

    clean_source_files(str(base), apply=False, p2m=True, objects=True)
    assert os.path.exists(str(proj / "stale.diag"))   # dry run: untouched

    clean_source_files(str(base), apply=True, p2m=True, objects=True)
    assert os.path.exists(str(proj / "scene.diag"))
    assert not os.path.exists(str(proj / "stale.diag"))
    assert os.path.exists(str(proj / "keep.city"))
    assert not os.path.exists(str(proj / "orphan.ter"))
    assert os.path.exists(str(proj / "study" / "p.paths.t001.p2m"))
    assert os.path.exists(str(proj / "study" / "p.pl.t001.p2m"))
    assert not os.path.exists(str(proj / "study" / "p.doa.t001.p2m"))


def test_rename_param_key(tmp_path):
    root = tmp_path / "scenarios"
    for name, keys in (("a", {"txrx": {"x": 1}, "other": 2}),
                       ("b", {"txrx_sets": {}})):
        _mk(str(root / name / "params.json"), json.dumps(keys))
    assert rename_param_key(str(root), apply=False) == 1
    assert "txrx" in json.load(open(root / "a" / "params.json"))
    assert rename_param_key(str(root), apply=True) == 1
    pa = json.load(open(root / "a" / "params.json"))
    assert "txrx_sets" in pa and "txrx" not in pa and pa["other"] == 2


def test_cli_entry(tmp_path, capsys):
    folder = tmp_path / "f"
    _mk(str(folder / "insite" / "x.setup"))
    assert main(["move-insite-out", str(folder)]) == 0
    out = capsys.readouterr().out
    assert "dry run" in out and os.path.exists(str(folder / "insite"))


def test_zoom_image_gated(tmp_path):
    from deepmimo_tpu.scripts.insite_ops_cli import zoom_image
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(RuntimeError, match="Pillow"):
            zoom_image("in.png", "out.png")
        return
    import numpy as np
    from PIL import Image
    src = tmp_path / "in.png"
    Image.fromarray(np.random.randint(
        0, 255, (64, 96, 3), np.uint8)).save(str(src))
    dst = tmp_path / "out.png"
    zoom_image(str(src), str(dst), zoom=1.5, size=(96, 64))
    assert Image.open(str(dst)).size == (96, 64)
