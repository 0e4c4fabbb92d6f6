"""Programmatic Wireless InSite project writing (setup/txrx/geometry).

Builds the .setup and .txrx files for an automated run by editing the
shipped templates (project-automation parity: reference deepmimo/pipelines/
wireless_insite/WI_interface/SetupEditor.py:72-330, TxRxEditor.py).
"""

from __future__ import annotations

import os
import re
from typing import Dict

import numpy as np

# Users must provide their InSite project template (version-specific,
# shipped with the InSite installation) via rt_params['setup_template'].
TEMPLATE_SETUP = os.environ.get("INSITE_SETUP_TEMPLATE", "")


def _edit_setup_values(text: str, replacements: Dict[str, str]) -> str:
    """Replace ``label value`` lines in an InSite setup file."""
    for label, value in replacements.items():
        text = re.sub(rf"(^\s*{re.escape(label)}\s+)\S.*$",
                      lambda m: m.group(1) + str(value),
                      text, count=1, flags=re.MULTILINE)
    return text


def write_insite_project(row_dir: str, out_dir: str, tx_pos: np.ndarray,
                         rx_pos: np.ndarray, rt_params: Dict) -> str:
    """Write the project files for one run; returns the .setup path."""
    os.makedirs(out_dir, exist_ok=True)

    template = rt_params.get("setup_template", TEMPLATE_SETUP)
    if not os.path.exists(template):
        raise FileNotFoundError(
            f"InSite setup template not found: {template}. Provide one via "
            "rt_params['setup_template'].")
    with open(template) as f:
        setup_text = f.read()

    setup_text = _edit_setup_values(setup_text, {
        "CarrierFrequency": rt_params.get("frequency", 3.5e9),
        "bandwidth": rt_params.get("bandwidth", 10e6),
        "max_reflections": rt_params.get("max_reflections", 4),
        "max_transmissions": rt_params.get("max_transmissions", 0),
        "max_wedge_diffractions": rt_params.get("max_diffractions", 0),
        "ray_spacing": rt_params.get("ray_spacing", 0.25),
    })

    setup_path = os.path.join(out_dir, "project.setup")
    with open(setup_path, "w") as f:
        f.write(setup_text)

    _write_txrx(os.path.join(out_dir, "project.txrx"), tx_pos, rx_pos)
    return setup_path


def _write_txrx(path: str, tx_pos: np.ndarray, rx_pos: np.ndarray) -> None:
    """Write a .txrx file: TX points + an RX grid/point list."""
    lines = ["Format type:keyword version: 1.1.0"]

    for i, pos in enumerate(np.atleast_2d(tx_pos)):
        lines += [
            f"begin_<points> BS_{i}",
            "project_id 1",
            f"begin_<location>",
            "begin_<reference>",
            "cartesian",
            "end_<reference>",
            f"nVertices 1",
            f"{pos[0]:.6f} {pos[1]:.6f} {pos[2]:.6f}",
            "end_<location>",
            "transmitter",
            "end_<points>",
        ]

    rx_pos = np.atleast_2d(rx_pos)
    lines += [
        "begin_<points> users",
        "project_id 2",
        "begin_<location>",
        "begin_<reference>",
        "cartesian",
        "end_<reference>",
        f"nVertices {len(rx_pos)}",
    ]
    lines += [f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}" for p in rx_pos]
    lines += [
        "end_<location>",
        "receiver",
        "end_<points>",
    ]

    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
