"""Integration test: TOML config -> rig -> calibration -> analysis steps."""

from datetime import datetime, timedelta
from pathlib import Path

import numpy as np
import pytest

import darsia_tpu as da
from darsia_tpu.presets.workflows.analysis import (
    analysis_mass_from_context,
    analysis_segmentation_from_context,
    analysis_volume_from_context,
    prepare_analysis_context,
)

START = datetime(2026, 8, 1, 12, 0, 0)
H, W = 64, 96


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    work = tmp_path_factory.mktemp("wf")
    images = work / "images"
    images.mkdir()
    results = work / "results"
    results.mkdir()

    base = np.full((H, W, 3), 0.5, np.float32)

    def save_img(name, arr):
        da.Image(
            arr.astype(np.float32), width=2.0, height=1.0, color_space="RGB"
        ).save(images / f"{name}.npz")

    da.Image(base, width=2.0, height=1.0, color_space="RGB").save(
        work / "baseline.npz"
    )
    save_img("img_000", base)
    for i, growth in enumerate((8, 16, 24), start=1):
        arr = base.copy()
        arr[20:20 + growth, 10:10 + 2 * growth] += [0.3, -0.1, -0.1]
        arr[20:20 + growth, 58:58 + growth] += [0.15, -0.05, -0.05]
        save_img(f"img_{i:03d}", np.clip(arr, 0, 1))

    labels = np.zeros((H, W), np.int32)
    labels[:, 48:] = 1
    np.save(work / "labels.npy", labels)
    np.save(work / "depth.npy", np.full((H, W), 0.02, np.float32))
    (work / "facies.csv").write_text(
        "id,porosity,permeability\n0,0.44,2e-10\n1,0.36,9e-11\n"
    )

    rows = ["image_id,datetime,path"]
    for i in range(4):
        dt = START + timedelta(hours=i)
        rows.append(f"{i},{dt.isoformat()},img_{i:03d}.npz")
    (work / "imaging.csv").write_text("\n".join(rows))
    (work / "injection.csv").write_text(
        "location_x,location_y,start,end,rate_kg_s\n"
        f"0.5,0.5,{START.isoformat()},"
        f"{(START + timedelta(hours=3)).isoformat()},{0.002 / 3600 / 3}\n"
    )
    (work / "pt.csv").write_text(
        "datetime,pressure,temperature\n"
        f"{START.isoformat()},1.01,22.0\n"
        f"{(START + timedelta(hours=4)).isoformat()},1.01,22.0\n"
    )

    class Exp0:
        experiment_start = START
        injection_protocol = None
        pressure_temperature_protocol = None

        def get_datetime(self, path):
            return START

    rig = da.Rig()
    rig.setup(
        experiment=Exp0(),
        baseline_path=work / "baseline.npz",
        depth_map_path=work / "depth.npy",
        labels_path=work / "labels.npy",
        facies_props_path=work / "facies.csv",
    )
    rig_folder = results / "setup" / "rig"
    rig.save(rig_folder)

    calib = (
        results / "calibration" / "color" / "co2" / "color_to_mass"
        / "from_labels"
    )
    path0 = da.ColorPath(
        relative_colors=[np.zeros(3), np.array([0.3, -0.1, -0.1])],
        base_color=np.full(3, 0.5),
    )
    path1 = da.ColorPath(
        relative_colors=[np.zeros(3), np.array([0.15, -0.05, -0.05])],
        base_color=np.full(3, 0.5),
    )
    interp = {
        0: da.ColorPathInterpolation(path0, da.ColorMode.RELATIVE, values=[0, 1]),
        1: da.ColorPathInterpolation(path1, da.ColorMode.RELATIVE, values=[0, 1]),
    }
    sig = {
        k: da.PWTransformation(supports=[0, 0.5, 1], values=[0, 0.4, 1])
        for k in (0, 1)
    }
    chain = da.HeterogeneousColorToMassAnalysis(
        baseline=rig.baseline,
        labels=rig.labels,
        color_mode=da.ColorMode.RELATIVE,
        color_path_interpretation=interp,
        signal_functions=sig,
        flash=da.SimpleFlash(0.05, 0.5, 0.5, 1.0),
        co2_mass_analysis=da.CO2MassAnalysis(
            rig.baseline, atmospheric_pressure=1.01,
            atmospheric_temperature=22.0,
        ),
        geometry=rig.geometry,
    )
    chain.save(calib)

    (work / "config.toml").write_text(f"""
[data]
folder = "{images}"
baseline = "img_000.npz"
results = "{results}"

[rig]
width = 2.0
height = 1.0
dim = 2
path = "{rig_folder}"

[protocol]
imaging = "{work / 'imaging.csv'}"
injection = "{work / 'injection.csv'}"
pressure_temperature = "{work / 'pt.csv'}"

[roi.left]
name = "left"
corner_1 = [0.0, 0.0]
corner_2 = [1.0, 1.0]

[color.path.co2]
mode = "relative"
basis = "labels"

[analysis.mass]
color = "co2"
roi = ["left"]
export = ["mass", "rescaled_mass"]

[analysis.volume]
roi = ["left"]

[analysis.segmentation]
label = "CO2"
mode = "saturation_g"
thresholds = [0.5]
color = [[255, 255, 0]]

[analysis.fingers]
mode = "saturation_g"
threshold = 0.5
include_skeleton_analysis = true
""")
    return work, results


@pytest.fixture(scope="module")
def context(workspace):
    work, _ = workspace
    return prepare_analysis_context(
        cls=da.Rig,
        path=work / "config.toml",
        all=True,
        require_color_to_mass=True,
    )


def test_context_preparation(context):
    assert len(context.image_paths) == 4
    assert context.color_to_mass_analysis is not None
    assert context.fluidflower.geometry is not None


def test_mass_hot_loop(workspace, context):
    _, results = workspace
    events = []
    df = analysis_mass_from_context(context, progress_callback=events.append)
    assert len(df) == 4
    # Rescaled mass matches injected mass at late times.
    late = df.sort_values("time").iloc[-1]
    assert late["detected_mass_total_rescaled"] == pytest.approx(
        late["exact_mass_total"], rel=1e-3
    )
    # ROI columns present and bounded by totals.
    assert late["left_detected_mass"] <= late["detected_mass_total"] + 1e-12
    # Field exports written.
    assert (results / "mass" / "mass").exists()
    assert list((results / "mass" / "mass" / "npz").glob("*.npz"))
    assert {e["event"] for e in events} == {
        "step_start", "image_progress", "step_complete",
    }


def test_volume_step(workspace, context):
    df = analysis_volume_from_context(context)
    volumes = df.sort_values("time")["volume_g_total"].tolist()
    # Gas volume grows with the plume.
    assert volumes[0] == pytest.approx(0.0, abs=1e-9)
    assert volumes[-1] > volumes[1] > 0


def test_segmentation_step(workspace, context):
    _, results = workspace
    analysis_segmentation_from_context(context)
    jpgs = list((results / "segmentation" / "default").glob("*.jpg"))
    assert len(jpgs) == 4


def test_gui_worker_runs_mass_step(workspace):
    """GUI worker process runs a real analysis step end-to-end; logs and
    typed progress events arrive over the queues (reference GUI process
    model, user_interface_gui.py:190-230)."""
    import time as _time

    from darsia_tpu.presets.workflows.user_interface_gui import GuiSession

    work, results = workspace
    session = GuiSession(cache_path=work / "gui_session.json")
    session.set_config(work / "config.toml")
    handle = session.start_step("analysis: mass", all_images=True)

    logs, events = [], []
    deadline = _time.time() + 600
    while _time.time() < deadline:
        handle.poll(on_log=logs.append, on_progress=events.append)
        if handle.finished and not handle.alive():
            break
        _time.sleep(0.5)
    handle.poll(on_log=logs.append, on_progress=events.append)
    if not handle.finished and handle.alive():
        # Hung worker: dump its Python traceback (SIGUSR1 hook in
        # _worker) to stderr before failing, for flake diagnosis.
        import os
        import signal

        os.kill(handle.process.pid, signal.SIGUSR1)
        _time.sleep(2)
    assert handle.finished, f"worker did not finish; logs: {logs[-5:]}"
    assert not handle.failed, f"worker failed; logs: {logs[-5:]}"
    kinds = {e.get("event") for e in events if isinstance(e, dict)}
    assert {"step_start", "image_progress", "step_complete"} <= kinds
    # Session cache recorded the run.
    assert session.state["last_step"] == "analysis: mass"
    assert session.state["history"]


def test_fingers_step(workspace, context):
    """Fingers step produces the reference statistics.csv schema
    (ref analysis_fingers.py:212-226, 940-987) + identity-tracked counts."""
    import pandas as pd

    from darsia_tpu.presets.workflows.analysis import (
        analysis_fingers_from_context,
    )

    _, results = workspace
    analysis_fingers_from_context(context)
    stats_path = results / "fingers" / "statistics.csv"
    assert stats_path.exists()
    stats = pd.read_csv(stats_path)
    expected_columns = {
        "time", "key", "image", "contour_length", "number_tips",
        "number_fjords", "number_skeleton_leaves",
        "number_skeleton_junctions", "roi_width", "finger_frequency",
        "finger_wavelength", "number_fingers", "number_new_fingers",
        "number_continuing_fingers", "number_ending_fingers",
        "number_splitting_fingers",
    }
    assert expected_columns <= set(stats.columns)
    assert len(stats) == 4
    # The plume grows: the late contour is longer than the early one.
    grown = stats.dropna(subset=["time"]).sort_values("time")
    assert grown["contour_length"].iloc[-1] > 0
    # Identity statistics are self-consistent.
    assert (
        stats["number_new_fingers"] + stats["number_continuing_fingers"]
        == stats["number_fingers"]
    ).all()
    # New columns of the deep schema (ref analysis_fingers.py:930-1005).
    deep_columns = {
        "number_leaves", "number_junctions", "number_base_junctions",
        "number_base_fingers", "number_new_base_fingers",
        "number_continuing_base_fingers", "number_ending_base_fingers",
        "number_new_splitting_fingers", "number_skeleton_leaves",
    }
    assert deep_columns <= set(stats.columns)
    # Reference folder schema: per-image overlays for every category.
    fingers = results / "fingers"
    for sub in (
        "tips", "fjords", "paths", "skeleton", "skeleton-leaf-paths",
        "skeleton-junction-paths", "skeleton-base-junction-paths",
    ):
        pngs = list((fingers / sub).rglob("*.png"))
        assert len(pngs) >= 4, f"expected per-image overlays in {sub}/"
    # statistics.json path log: per-finger physical coordinates, speeds,
    # travel distances + per-time aggregates (ref :628-900).
    import json

    with open(fingers / "statistics.json") as f:
        pstats = json.load(f)
    for section in (
        "paths", "fjord_paths", "leaf_paths", "junction_paths",
        "base_junction_paths",
    ):
        assert section in pstats
    assert len(pstats["times"]) >= 4 and len(pstats["images"]) >= 4
    peak_log = pstats["paths"]["full"]
    finger_records = {
        k: v for k, v in peak_log.items() if k.startswith("path_")
    }
    assert finger_records, "expected tracked finger paths"
    rec = next(iter(finger_records.values()))
    for field in (
        "start", "end", "time", "coordinates", "velocities", "speed",
        "vertical_speed", "travel_distance", "vertical_travel_distance",
    ):
        assert field in rec
    assert len(rec["coordinates"]) == len(rec["time"])
    assert len(rec["travel_distance"]) == len(rec["time"])
    # travel distance is cumulative.
    td = rec["travel_distance"]
    assert all(b >= a - 1e-12 for a, b in zip(td, td[1:]))
    # Per-time aggregates present with the reference keys.
    stats_by_time = peak_log["statistics"]
    assert stats_by_time
    one = next(iter(stats_by_time.values()))
    for field in (
        "horizontal_distances", "coordinates", "travel_distances",
        "speeds", "number_active_paths", "number_new_paths",
        "roi_width", "frequency", "wavelength", "contour_length",
    ):
        assert field in one
    # Path plots + advance-rate exports written.
    plots = list((results / "fingers" / "paths").rglob("*.png"))
    assert plots, "expected per-ROI path plots"
    rates = list((results / "fingers" / "paths").rglob("*advance_rates.csv"))
    assert rates, "expected advance-rate export"


def test_fingers_step_gradient_interface(workspace, context, tmp_path):
    """Gradient-based interface analysis: lower-arc extraction, interface
    folders + .npy physical exports + interface CSV columns
    (ref analysis_fingers.py:150-160, 280-510)."""
    import json

    import pandas as pd

    from darsia_tpu.presets.workflows.analysis import (
        analysis_fingers_from_context,
    )
    from darsia_tpu.presets.workflows.config.fingers import FingersConfig

    _, results = workspace
    # Clone the context's fingers config with gradient analysis enabled
    # and a dedicated output folder.
    entry = FingersConfig().load(
        {
            "mode": "saturation_g",
            "threshold": 0.5,
            "include_gradient_based_analysis": True,
            "gradient_mode": "saturation_g",
        }
    )
    original = context.config.analysis.fingers
    folder = tmp_path / "fingers_gradient"

    class _Holder:
        pass

    holder = _Holder()
    holder.config = entry
    holder.folder = folder
    context.config.analysis.fingers = holder
    try:
        analysis_fingers_from_context(context)
    finally:
        context.config.analysis.fingers = original

    for sub in ("interface", "interface-contour", "interface-contour-npy",
                "interface-paths"):
        assert (folder / sub).exists(), f"missing {sub}/"
    npys = list((folder / "interface-contour-npy").rglob("*.npy"))
    assert len(npys) >= 4
    import numpy as np

    arcs = np.load(npys[-1], allow_pickle=True)
    if len(arcs):
        arc = np.asarray(arcs[0])
        assert arc.ndim == 2 and arc.shape[1] == 2  # physical (x, y)
    stats = pd.read_csv(folder / "statistics.csv")
    assert {"number_interface_fingers", "number_new_interface_fingers"} <= set(
        stats.columns
    )
    with open(folder / "statistics.json") as f:
        pstats = json.load(f)
    assert "interface_paths" in pstats
