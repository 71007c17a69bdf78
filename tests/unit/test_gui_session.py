"""Headless GUI-core tests: session cache, registry, queue protocol.

Mirrors the reference's approach ("GUI logic tested headlessly via queue
protocol, no display", SURVEY §4 / reference test_user_interface_gui.py).
"""

import logging
import multiprocessing as mp

import pytest

from darsia_tpu.presets.workflows.user_interface_gui import (
    ERROR_SENTINEL,
    STEP_REGISTRY,
    GuiSession,
    WorkerHandle,
)


def test_registry_covers_all_workflow_families():
    families = {step.split(":")[0] for step in STEP_REGISTRY}
    # All six reference GUI tab families (user_interface_gui.py:1029-1204).
    assert families == {
        "setup", "calibration", "analysis", "comparison", "helper", "utils",
    }
    # Every analysis step from the CLI front-end is launchable.
    analysis = {s for s in STEP_REGISTRY if s.startswith("analysis:")}
    assert {
        "analysis: mass", "analysis: volume", "analysis: segmentation",
        "analysis: fingers", "analysis: thresholding", "analysis: cropping",
    } <= analysis


def test_session_cache_roundtrip(tmp_path):
    cache = tmp_path / "session.json"
    session = GuiSession(cache_path=cache)
    session.set_config("/some/config.toml")
    session.state["all_images"] = True
    session.save_cache()

    restored = GuiSession(cache_path=cache)
    assert restored.config_paths == ["/some/config.toml"]
    assert restored.state["all_images"] is True


def test_start_step_validation(tmp_path):
    session = GuiSession(cache_path=tmp_path / "s.json")
    with pytest.raises(KeyError):
        session.start_step("nonsense step")
    with pytest.raises(ValueError):
        session.start_step("analysis: mass")  # no config selected


def _fake_handle():
    ctx = mp.get_context("spawn")

    class DeadProcess:
        pid = -1
        exitcode = 0  # clean exit; sentinels decide finished/failed

        def is_alive(self):
            return False

        def terminate(self):
            pass

        def join(self, timeout=None):
            pass

    return WorkerHandle(
        step="analysis: mass",
        process=DeadProcess(),
        log_queue=ctx.Queue(),
        progress_queue=ctx.Queue(),
        preview_queue=ctx.Queue(),
    )


def test_poll_drains_queues_and_flags_errors():
    handle = _fake_handle()
    handle.log_queue.put(logging.makeLogRecord({"msg": "hello"}))
    handle.log_queue.put(
        logging.makeLogRecord({"msg": ERROR_SENTINEL + "step crashed"})
    )
    handle.progress_queue.put(
        {"event": "image_progress", "image_index": 1, "image_total": 4}
    )
    handle.progress_queue.put(("__done__", "analysis_mass_from_context"))
    handle.preview_queue.put({"mass": b"png-bytes"})

    import time

    time.sleep(0.2)  # let the queue feeder threads flush

    logs, events, previews = [], [], []
    counts = handle.poll(
        on_log=logs.append,
        on_progress=events.append,
        on_preview=previews.append,
    )
    assert counts["log"] == 2
    assert logs[0] == "hello"
    assert logs[1] == "step crashed"  # sentinel stripped
    assert handle.failed is True
    assert handle.finished is True
    assert events == [
        {"event": "image_progress", "image_index": 1, "image_total": 4}
    ]
    assert previews == [{"mass": b"png-bytes"}]


def test_worker_error_surfaces_over_queue(tmp_path):
    """A failing step reports via the error sentinel instead of killing the
    session (reference GUI process model: errors cross the queue)."""
    import time as _time

    from darsia_tpu.presets.workflows.user_interface_gui import GuiSession

    session = GuiSession(cache_path=tmp_path / "cache.json")
    # Config path that exists but is not a valid workflow config.
    bad_config = tmp_path / "bad.toml"
    bad_config.write_text("[data]\nfolder = '/nonexistent-folder-xyz'\n")
    session.set_config(bad_config)
    handle = session.start_step("analysis: mass", all_images=True)
    logs, events = [], []
    deadline = _time.time() + 180
    while _time.time() < deadline:
        handle.poll(on_log=logs.append, on_progress=events.append)
        if handle.finished and not handle.alive():
            break
        _time.sleep(0.2)
    handle.poll(on_log=logs.append, on_progress=events.append)
    assert handle.finished
    assert handle.failed
    assert any("failed" in str(line) for line in logs)


def test_worker_stop_terminates(tmp_path):
    """stop() tears down a running worker."""
    import time as _time

    from darsia_tpu.presets.workflows.user_interface_gui import GuiSession

    session = GuiSession(cache_path=tmp_path / "cache.json")
    bad_config = tmp_path / "slow.toml"
    bad_config.write_text("[data]\nfolder = '/nonexistent-abc'\n")
    session.set_config(bad_config)
    handle = session.start_step("analysis: mass", all_images=True)
    # Stop immediately; the process must terminate.
    handle.stop()
    deadline = _time.time() + 30
    while _time.time() < deadline and handle.alive():
        _time.sleep(0.2)
    assert not handle.alive()
    session.stop_all()


def test_step_parameter_forms():
    """Per-step parameter forms: registry, coercion, validation
    (reference per-step option checkboxes, user_interface_gui.py:1005+)."""
    from darsia_tpu.presets.workflows.gui_support import (
        step_parameters,
        validate_options,
    )

    common = step_parameters("analysis: mass")
    assert [p.name for p in common] == ["all_images"]
    fingers = step_parameters("analysis: fingers")
    assert {p.name for p in fingers} == {"all_images", "write_plots"}

    out = validate_options("analysis: fingers", {"write_plots": "false"})
    assert out == {"all_images": False, "write_plots": False}
    out = validate_options("analysis: fingers", {"all_images": 1})
    assert out["all_images"] is True and out["write_plots"] is True
    import pytest

    with pytest.raises(KeyError, match="bogus"):
        validate_options("analysis: mass", {"bogus": 1})


def test_batch_monitor_eta():
    from darsia_tpu.presets.workflows.gui_support import (
        BatchMonitor,
        format_duration,
    )

    monitor = BatchMonitor(window=3)
    assert monitor.text() == "idle"
    monitor.update({"event": "step_start", "step": "mass", "image_total": 10})
    # First image compile-dominated; later ones steady.
    for index, duration in enumerate([30.0, 2.0, 2.0, 2.0], start=1):
        monitor.update(
            {
                "event": "image_progress",
                "image_index": index,
                "image_total": 10,
                "image_duration_s": duration,
            }
        )
    assert monitor.processed == 4 and monitor.percent() == 40.0
    # Rolling window drops the compile outlier.
    assert monitor.average_runtime() == 2.0
    assert monitor.eta_seconds() == 12.0
    assert "ETA 00:00:12" in monitor.text() and "40%" in monitor.text()
    monitor.update({"event": "step_complete"})
    assert "done" in monitor.text()
    assert format_duration(3725) == "01:02:05"
    assert format_duration(None) == "--:--:--"


def test_preview_store_display():
    import numpy as np

    from darsia_tpu.presets.workflows.gui_support import PreviewStore

    store = PreviewStore()
    assert store.as_display() is None
    big = np.linspace(0, 1, 1000 * 600).reshape(1000, 600).astype(np.float32)
    store.update({"segmentation": big, "mass": np.ones((8, 8, 3))})
    assert store.keys() == ["segmentation", "mass"]
    assert store.selected == "segmentation"
    arr = store.as_display(max_size=480)
    assert arr.dtype == np.uint8 and arr.shape[-1] == 3
    assert max(arr.shape[:2]) <= 500
    store.select("mass")
    assert store.as_display().shape == (8, 8, 3)


def test_completion_dialog_spec():
    from darsia_tpu.presets.workflows.gui_support import completion_dialog

    done = completion_dialog("analysis: mass", failed=False, elapsed_s=65,
                            results_folder="/tmp/results")
    assert done["title"] == "Workflow finished"
    assert "00:01:05" in done["message"]
    assert "Open results folder" in done["buttons"]
    err = completion_dialog("analysis: mass", failed=True,
                            error="Boom\ntraceback...")
    assert err["title"] == "Workflow failed"
    assert "Boom" in err["message"] and "Show details" in err["buttons"]


def test_start_step_rejects_unknown_option(tmp_path):
    from darsia_tpu.presets.workflows.user_interface_gui import GuiSession

    session = GuiSession(cache_path=tmp_path / "cache.json")
    session.set_config(tmp_path / "missing.toml")
    import pytest

    with pytest.raises(KeyError, match="bogus"):
        session.start_step("analysis: mass", options={"bogus": True})
    assert [p.name for p in session.step_parameters("analysis: fingers")] == [
        "all_images",
        "write_plots",
    ]
