"""Reference-named GUI helper functions (parity: reference
``presets/workflows/user_interface_gui.py:98-652``)."""

from __future__ import annotations

import queue
from pathlib import Path

import pytest

from darsia_tpu.presets.workflows import gui_helpers as gh


class TestPathsAndQueues:
    def test_normalize_paths(self, tmp_path):
        raw = [str(tmp_path / "a.toml"), "  ", str(tmp_path / "a.toml"),
               str(tmp_path / "b.toml")]
        out = gh.normalize_paths(raw)
        assert out == [tmp_path / "a.toml", tmp_path / "b.toml"]
        assert gh.deduplicate_paths([Path("x"), Path("x"), Path("y")]) == [
            Path("x"), Path("y")
        ]

    def test_queue_hygiene(self):
        q: queue.Queue = queue.Queue()
        q.put("old1")
        q.put("old2")
        gh.publish_latest_queue_item(q, "new")
        assert q.get_nowait() == "new"
        assert q.empty()
        gh.clear_queue(q)  # empty queue is fine


class TestErrorDetails:
    def test_roundtrip(self):
        wrapped = gh.encode_workflow_error_details("Traceback ...")
        assert gh.decode_workflow_error_details(wrapped) == "Traceback ..."
        assert gh.decode_workflow_error_details("INFO: hi") is None
        assert gh.format_error_details_text("  boom  ") == "boom"
        assert "No workflow error details" in gh.format_error_details_text("  ")


class TestDurationsAndEta:
    def test_format_duration_seconds(self):
        assert gh.format_duration_seconds(3723) == "1:02:03"
        assert gh.format_duration_seconds(75) == "1:15"
        assert gh.format_duration_seconds(None) == "n/a"
        assert gh.format_duration_seconds(-3) == "n/a"
        assert gh.format_duration_seconds(float("nan")) == "n/a"
        assert gh.format_duration_seconds(True) == "n/a"

    def test_rolling_average(self):
        assert gh.rolling_average_runtime([]) is None
        assert gh.rolling_average_runtime([0.0, -1.0]) is None
        assert gh.rolling_average_runtime([10.0, 2.0, 4.0], max_samples=2) == 3.0
        assert gh.rolling_average_runtime([1.0], max_samples=0) is None

    def test_eta(self):
        assert gh.remaining_image_count(3, 10) == 7
        assert gh.remaining_image_count(12, 10) == 0
        assert gh.estimate_remaining_time_seconds(None, 5, 10) is None
        assert gh.estimate_remaining_time_seconds(2.0, 1, 10) is None
        assert gh.estimate_remaining_time_seconds(2.0, 4, 10) == 12.0
        assert gh.estimate_remaining_time_seconds(2.0, 12, 10) == 0.0
        assert gh.progress_percent(0, 0) == 0.0
        assert gh.progress_percent(15, 10) == 100.0

    def test_batch_monitor_text(self):
        text = gh.format_batch_monitor_text(
            step="mass",
            image_path="img.jpg",
            processed=2,
            total=8,
            last_image_seconds=1.2,
            eta_seconds=7.5,
        )
        assert "Current analysis step: mass" in text
        assert "Image count: 2/8 (25.0%)" in text
        assert "Estimated remaining: 0:08" in text


class TestMessagesAndDialogs:
    def test_enabled_option_labels(self):
        labels = gh.enabled_option_labels(
            {"export_bundle": True, "media": False, "download": True},
            exclude={"download"},
        )
        assert labels == ["export bundle"]

    def test_workflow_messages(self):
        start = gh.format_workflow_start_message(
            "analysis", ["mass"], [Path("cfg.toml")], ""
        )
        assert "Starting analysis workflow" in start and "cfg.toml" in start
        done = gh.format_workflow_done_message("analysis", [], 2, 1.25)
        assert "Analysis completed" in done and "Duration: 1.2s" in done
        err = gh.format_workflow_error_message("setup", ["rig"], 3)
        assert "exit code 3" in err

    def test_completion_dialog_spec(self):
        assert gh.completion_dialog_spec("analysis", 1, True) is None
        kind, title, _ = gh.completion_dialog_spec("analysis", 0, False)
        assert (kind, title) == ("info", "Done")
        kind, title, msg = gh.completion_dialog_spec("analysis", 2, False)
        assert kind == "error" and "exit code 2" in msg

    def test_conflict_policy(self):
        assert gh.map_conflict_dialog_choice_to_policy(True) == "overwrite_all"
        assert gh.map_conflict_dialog_choice_to_policy(False) == "skip_all"
        assert gh.map_conflict_dialog_choice_to_policy(None) is None


class TestFolderSuggestions:
    def _config(self, tmp_path, extra: str = "") -> Path:
        cfg = tmp_path / "config.toml"
        cfg.write_text(
            "\n".join(
                [
                    "[data]",
                    f'results = "{tmp_path / "results"}"',
                    extra,
                ]
            )
        )
        return cfg

    def test_analysis_suggestion(self, tmp_path):
        cfg = self._config(tmp_path)
        results = tmp_path / "results"
        assert (
            gh.suggested_analysis_results_folder([cfg], ["mass"])
            == results / "mass"
        )
        # multiple modes -> plain results folder
        assert (
            gh.suggested_analysis_results_folder([cfg], ["mass", "volume"])
            == results
        )
        # configured override wins
        cfg2 = self._config(
            tmp_path, '[analysis.mass]\nfolder = "/tmp/override"'
        )
        assert gh.suggested_analysis_results_folder([cfg2], ["mass"]) == Path(
            "/tmp/override"
        )

    def test_workflow_suggestion(self, tmp_path):
        cfg = self._config(tmp_path)
        results = tmp_path / "results"
        assert (
            gh.suggested_workflow_results_folder("setup", [cfg], ["depth"])
            == results / "setup" / "depth"
        )
        assert (
            gh.suggested_workflow_results_folder("calibration", [cfg], [])
            == results / "calibration"
        )
        assert gh.suggested_workflow_results_folder("setup", [cfg], []) is None
        assert (
            gh.suggested_workflow_results_folder("analysis", [cfg], ["fingers"])
            == results / "fingers"
        )

    def test_no_results_folder(self, tmp_path):
        cfg = tmp_path / "config.toml"
        cfg.write_text("[data]\n")
        assert gh.suggested_analysis_results_folder([cfg], ["mass"]) is None


class TestUtilsBundleDefaults:
    def test_resolve(self, tmp_path):
        cfg = tmp_path / "config.toml"
        cfg.write_text(
            "[utils]\n"
            'export_calibration_bundle = "/tmp/out.zip"\n'
        )
        export, imported = gh.resolve_utils_bundle_defaults([str(cfg)])
        assert export == "/tmp/out.zip" and imported == ""
        assert gh.resolve_utils_bundle_defaults([]) == ("", "")


class TestAbortProcess:
    def test_none_and_dead(self):
        assert gh.abort_process(None) is False

        class Dead:
            def is_alive(self):
                return False

        assert gh.abort_process(Dead()) is False

    def test_live_process(self):
        import multiprocessing as mp
        import time

        process = mp.Process(target=time.sleep, args=(30,))
        process.start()
        try:
            assert gh.abort_process(process) is True
            assert not process.is_alive()
        finally:
            if process.is_alive():
                process.kill()


class TestComparisonAndUtilsSuggestions:
    def _config(self, tmp_path, extra: str = "") -> Path:
        cfg = tmp_path / "config.toml"
        cfg.write_text(
            "\n".join(
                ["[data]", f'results = "{tmp_path / "results"}"', extra]
            )
        )
        return cfg

    def test_comparison_defaults_and_overrides(self, tmp_path):
        cfg = self._config(tmp_path)
        results = tmp_path / "results"
        assert (
            gh.suggested_workflow_results_folder("comparison", [cfg], ["events"])
            == results / "events"
        )
        assert (
            gh.suggested_workflow_results_folder(
                "comparison", [cfg], ["wasserstein compute"]
            )
            == results / "wasserstein"
        )
        # Both selected -> plain results.
        assert (
            gh.suggested_workflow_results_folder(
                "comparison", [cfg], ["events", "wasserstein compute"]
            )
            == results
        )
        assert (
            gh.suggested_workflow_results_folder("comparison", [cfg], [])
            is None
        )
        # Config overrides win.
        cfg2 = self._config(
            tmp_path, '[wasserstein]\nresults = "/tmp/w1_out"'
        )
        assert gh.suggested_workflow_results_folder(
            "comparison", [cfg2], ["wasserstein compute"]
        ) == Path("/tmp/w1_out")
        cfg3 = self._config(tmp_path, '[events]\npath = "/tmp/ev/events.csv"')
        assert gh.suggested_workflow_results_folder(
            "comparison", [cfg3], ["events"]
        ) == Path("/tmp/ev")

    def test_utils_candidates(self, tmp_path):
        cfg = self._config(tmp_path)
        results = tmp_path / "results"
        assert (
            gh.suggested_workflow_results_folder("utils", [cfg], ["media"])
            == results / "videos"
        )
        assert (
            gh.suggested_workflow_results_folder(
                "utils", [cfg], ["export calibration", "import calibration"]
            )
            == results / "calibration"
        )
        # Mixed targets fall back to the results root.
        assert (
            gh.suggested_workflow_results_folder(
                "utils", [cfg], ["media", "download"]
            )
            == results
        )
        assert (
            gh.suggested_workflow_results_folder("utils", [cfg], [])
            is None
        )
        cfg2 = self._config(tmp_path, '[download]\nfolder = "/tmp/dl"')
        assert gh.suggested_workflow_results_folder(
            "utils", [cfg2], ["download"]
        ) == Path("/tmp/dl")
