"""Scenario summary: human-readable text + overview plots from params.json.

Capability parity with reference deepmimo/summary.py:50-273.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from . import consts as c
from .utils import load_dict_from_json, get_params_path, get_scenario_folder


def summary(scenario_name: str, print_summary: bool = True) -> str:
    """Build (and optionally print) a text summary of a scenario."""
    params = load_dict_from_json(get_params_path(scenario_name))
    rt = params.get(c.RT_PARAMS_PARAM_NAME, {})
    txrx = params.get(c.TXRX_PARAM_NAME, {})
    scene = params.get(c.SCENE_PARAM_NAME, {})
    materials = params.get(c.MATERIALS_PARAM_NAME, {})

    lines = [
        f"DeepMIMO Scenario: {scenario_name}",
        "=" * 50,
        "",
        "Ray tracing",
        "-" * 50,
        f"  Engine: {rt.get(c.RT_PARAM_RAYTRACER, '?')} "
        f"v{rt.get(c.RT_PARAM_RAYTRACER_VERSION, '?')}",
        f"  Frequency: {float(rt.get(c.RT_PARAM_FREQUENCY, 0))/1e9:.3f} GHz",
        f"  Max path depth: {rt.get(c.RT_PARAM_PATH_DEPTH, '?')} "
        f"(R={rt.get(c.RT_PARAM_MAX_REFLECTIONS, '?')}, "
        f"D={rt.get(c.RT_PARAM_MAX_DIFFRACTIONS, '?')}, "
        f"S={rt.get(c.RT_PARAM_MAX_SCATTERING, '?')}, "
        f"T={rt.get(c.RT_PARAM_MAX_TRANSMISSIONS, '?')})",
        f"  Rays: {rt.get(c.RT_PARAM_NUM_RAYS, '?')}",
        "",
        "TX/RX sets",
        "-" * 50,
    ]
    for key in sorted(txrx.keys()):
        s = txrx[key]
        role = ("TX" if s.get(c.TXRX_PARAM_IS_TX) else "") + \
               ("RX" if s.get(c.TXRX_PARAM_IS_RX) else "")
        lines.append(
            f"  [{s.get('id')}] {s.get('name', key)} ({role}): "
            f"{s.get(c.TXRX_PARAM_NUM_POINTS)} points "
            f"({s.get(c.TXRX_PARAM_NUM_ACTIVE_POINTS, '?')} active), "
            f"{s.get(c.TXRX_PARAM_NUM_ANT, 1)} antenna(s)")

    lines += ["", "Scene", "-" * 50,
              f"  Objects: {scene.get(c.SCENE_PARAM_N_OBJECTS, '?')}, "
              f"vertices: {scene.get(c.SCENE_PARAM_N_VERTICES, '?')}, "
              f"faces: {scene.get(c.SCENE_PARAM_N_FACES, '?')} "
              f"({scene.get(c.SCENE_PARAM_N_TRIANGULAR_FACES, '?')} tris)",
              f"  Snapshots: {scene.get(c.SCENE_PARAM_NUMBER_SCENES, 1)}",
              "", "Materials", "-" * 50]
    for key in sorted(materials.keys()):
        m = materials[key]
        lines.append(
            f"  [{m.get('id')}] {m.get('name', key)}: "
            f"eps={m.get(c.MATERIALS_PARAM_PERMITTIVITY)}, "
            f"sigma={m.get(c.MATERIALS_PARAM_CONDUCTIVITY)}, "
            f"scattering={m.get(c.MATERIALS_PARAM_SCATTERING_MODEL)}")

    text = "\n".join(lines)
    if print_summary:
        print(text)
    return text


def plot_summary(scenario_name: str, save_imgs: bool = False,
                 show_plots: bool = True) -> Optional[List[str]]:
    """Render overview plots: LoS map, scene 3D, aggregate statistics.

    Returns the list of saved image paths when ``save_imgs`` is True.
    """
    import matplotlib
    if not show_plots:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from .generator import load

    dataset = load(scenario_name)
    d = dataset[0] if hasattr(dataset, "datasets") else dataset

    folder = get_scenario_folder(scenario_name)
    saved: List[str] = []

    # LoS map
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111)
    rx = np.asarray(d[c.RX_POS_PARAM_NAME])
    los = np.asarray(d[c.LOS_PARAM_NAME])
    sc = ax.scatter(rx[:, 0], rx[:, 1], c=los, s=2, cmap="viridis")
    fig.colorbar(sc, ax=ax, label="LoS status")
    ax.set_title(f"{scenario_name}: LoS map")
    if save_imgs:
        path = os.path.join(folder, "summary_los.png")
        fig.savefig(path, dpi=120)
        saved.append(path)

    # Pathloss map
    fig2 = plt.figure(figsize=(8, 6))
    ax2 = fig2.add_subplot(111)
    pl = np.asarray(d[c.PATHLOSS_PARAM_NAME])
    sc2 = ax2.scatter(rx[:, 0], rx[:, 1], c=pl, s=2, cmap="magma")
    fig2.colorbar(sc2, ax=ax2, label="Pathloss (dB)")
    ax2.set_title(f"{scenario_name}: pathloss")
    if save_imgs:
        path = os.path.join(folder, "summary_pathloss.png")
        fig2.savefig(path, dpi=120)
        saved.append(path)

    # Scene
    scene = d.get(c.SCENE_PARAM_NAME)
    if scene is not None:
        ax3 = scene.plot()
        if save_imgs:
            path = os.path.join(folder, "summary_scene.png")
            ax3.figure.savefig(path, dpi=120)
            saved.append(path)

    if show_plots:
        plt.show()
    else:
        plt.close("all")
    return saved if save_imgs else None
