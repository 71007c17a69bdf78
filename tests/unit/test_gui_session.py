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
    assert families == {"setup", "calibration", "analysis", "comparison"}
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
    assert restored.state["config"] == "/some/config.toml"
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
