"""API parity batch: progress events, time-data views, GUI protocol
classes, linalg Krylov wrappers, color_to_mass config, result frames.

Parity targets: reference ``presets/workflows/analysis/progress.py``,
``config/time_data.py``, ``config/color_to_mass.py``,
``user_interface_gui.py:42-65,846-905``, ``utils/linalg.py:11-39``,
``helper/helper_result_reader.py:24-30``,
``utils/roi_visualization.py:17-22``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

import darsia_tpu as da


class TestProgressEvents:
    def test_typed_dict_and_publish(self):
        from darsia_tpu.presets.workflows.analysis.progress import (
            AnalysisProgressEvent,
            publish_image_progress,
            publish_step_complete,
        )

        events = []
        publish_image_progress(
            events.append,
            step="mass",
            image_path="a.jpg",
            image_index=1,
            image_total=4,
            image_duration_s=2.5,
            step_elapsed_s=10.0,
        )
        publish_step_complete(
            events.append, step="mass", image_total=4, step_elapsed_s=11.0
        )
        assert events[0]["step_elapsed_s"] == 10.0
        assert events[1]["image_total"] == 4
        payload: AnalysisProgressEvent = events[0]
        assert payload["event"] == "image_progress"

    def test_normalize_progress_event(self):
        from darsia_tpu.presets.workflows.analysis.progress import (
            normalize_progress_event,
        )

        assert normalize_progress_event("junk") is None
        assert normalize_progress_event({"event": "unknown", "step": "x"}) is None
        assert normalize_progress_event({"event": "step_start", "step": "  "}) is None
        out = normalize_progress_event(
            {
                "event": "image_progress",
                "step": " mass ",
                "image_index": 3,
                "image_total": -2,
                "image_duration_s": float("inf"),
                "step_elapsed_s": 4.5,
                "image_path": "b.jpg",
            }
        )
        assert out == {
            "event": "image_progress",
            "step": "mass",
            "image_index": 3,
            "image_total": 0,
            "step_elapsed_s": 4.5,
            "image_path": "b.jpg",
        }


class TestTimeDataViews:
    def test_image_time_data(self):
        from darsia_tpu.presets.workflows.config import ImageTimeData

        view = ImageTimeData().load({"times": [2.0, "01:00:00"], "tol": "00:06:00"})
        assert view.times == [1.0, 2.0]
        assert view.get_times_with_uncertainty() == [(1.0, 0.1), (2.0, 0.1)]

    def test_interval_data(self):
        from darsia_tpu.presets.workflows.config import ImageTimeIntervalData

        view = ImageTimeIntervalData().load(
            {
                "interval": {
                    "early": {"start": 0.0, "end": 2.0, "num": 3, "tol": 0.1},
                    "late": {"start": 5.0, "end": 9.0},
                }
            }
        )
        assert list(view.intervals) == ["early"]
        assert list(view.windows) == ["late"]
        times = view.get_times_with_uncertainty()
        assert times == [(0.0, 0.1), (1.0, 0.1), (2.0, 0.1)]

    def test_path_data_glob_and_relative(self, tmp_path):
        from darsia_tpu.presets.workflows.config import PathData

        (tmp_path / "img_001.jpg").touch()
        (tmp_path / "img_002.jpg").touch()
        view = PathData().load({"paths": ["img_*.jpg"]}, data_folder=tmp_path)
        assert [p.name for p in view.paths] == ["img_001.jpg", "img_002.jpg"]
        assert view.validate()
        rel = PathData().load({"paths": "img_001.jpg"}, data_folder=[tmp_path])
        assert rel.paths == [tmp_path / "img_001.jpg"]
        missing = PathData().load({"paths": ["/nowhere/x.jpg"]})
        assert not missing.validate()

    def test_aggregate_views(self):
        from darsia_tpu.presets.workflows.config import TimeData

        data = TimeData().load(
            {
                "times": [1.0],
                "interval": {"a": {"start": 0.0, "end": 1.0, "num": 2}},
                "paths": ["x.jpg"],
            }
        )
        assert data.image_time_data.times == [1.0]
        assert list(data.image_interval_data.intervals) == ["a"]
        assert data.image_path_data.paths == [Path("x.jpg")]


class TestGuiProtocolClasses:
    def test_queue_log_handler(self):
        import logging
        import queue as queue_mod

        from darsia_tpu.presets.workflows.user_interface_gui import (
            QueueLogHandler,
            RunContext,
            SupportsLogQueue,
            SupportsQueue,
            UtilsWorkflowOptions,
        )

        sink: queue_mod.Queue = queue_mod.Queue()
        handler = QueueLogHandler(sink)
        handler.setFormatter(logging.Formatter("%(levelname)s:%(message)s"))
        record = logging.LogRecord(
            "t", logging.WARNING, __file__, 1, "plume detected", None, None
        )
        handler.emit(record)
        assert sink.get_nowait() == "WARNING:plume detected"

        ctx = RunContext(config_paths=[Path("a.toml")])
        assert ctx.rig_cls is None
        options: UtilsWorkflowOptions = {"media": True, "export_bundle": "b.zip"}
        assert options["media"] is True
        assert SupportsLogQueue is not None and SupportsQueue is not None

    def test_workflow_gui_exported(self):
        from darsia_tpu.presets.workflows.user_interface_gui import WorkflowGUI

        assert hasattr(WorkflowGUI, "run") and hasattr(WorkflowGUI, "close")


class TestLinalgKrylovWrappers:
    def test_cg_class(self):
        from darsia_tpu.utils.linalg import CG

        rng = np.random.default_rng(0)
        M = rng.normal(size=(12, 12))
        A = M @ M.T + 12 * np.eye(12)
        b = rng.normal(size=12)
        solver = CG(A)
        solver.setup({"rtol": 1e-10, "maxiter": 200})
        x = solver.solve(b)
        np.testing.assert_allclose(A @ x, b, atol=1e-6)
        # kwargs override stored options
        x2 = solver.solve(b, rtol=1e-10)
        np.testing.assert_allclose(A @ x2, b, atol=1e-6)

    def test_gmres_class(self):
        from darsia_tpu.utils.linalg import GMRES

        rng = np.random.default_rng(1)
        A = rng.normal(size=(10, 10)) + 10 * np.eye(10)  # nonsymmetric
        b = rng.normal(size=10)
        x = GMRES(A).solve(b, rtol=1e-10)
        np.testing.assert_allclose(A @ x, b, atol=1e-6)


class TestColorToMassConfig:
    def test_load(self, tmp_path):
        from darsia_tpu.presets.workflows.config import (
            ColorToMassConfig,
            RoiRegistry,
        )

        toml = tmp_path / "config.toml"
        toml.write_text(
            "\n".join(
                [
                    "[color_to_mass]",
                    'mode = "manual"',
                    'fluid = "tracer"',
                    'basis = "labels"',
                    "threshold = 0.3",
                    "[color_to_mass.data]",
                    "times = [1.0, 2.0]",
                    "[color_to_mass.roi.boxA]",
                    "corner_1 = [0.0, 0.0]",
                    "corner_2 = [0.5, 0.5]",
                ]
            )
        )
        registry = RoiRegistry()
        cfg = ColorToMassConfig().load(
            toml, results=tmp_path / "results", roi_registry=registry
        )
        assert cfg.fluid == "tracer" and cfg.threshold == 0.3
        assert cfg.data is not None and cfg.data.image_times == [1.0, 2.0]
        assert "boxA" in cfg.rois
        assert "color_to_mass" in str(cfg.calibration_folder)

    def test_missing_data_warns(self, tmp_path):
        from darsia_tpu.presets.workflows.config import ColorToMassConfig

        toml = tmp_path / "config.toml"
        toml.write_text('[color_to_mass]\nmode = "manual"\n')
        with pytest.warns(UserWarning):
            cfg = ColorToMassConfig().load(toml, results=tmp_path)
        assert cfg.data is None


class TestResultFrames:
    def test_load_result_frames(self, tmp_path):
        from darsia_tpu.presets.workflows.helper import (
            ResultFrame,
            load_result_frames,
        )

        img = da.ScalarImage(
            np.linspace(0, 1, 16, dtype=np.float32).reshape(4, 4),
            width=1.0,
            height=1.0,
        )
        target = tmp_path / "frame_000.npz"
        img.save(target)
        frames = load_result_frames([target])
        assert len(frames) == 1
        frame = frames[0]
        assert isinstance(frame, ResultFrame)
        assert frame.source_name == "frame_000"
        assert frame.minimum == pytest.approx(0.0)
        assert frame.maximum == pytest.approx(1.0)
        assert frame.integral == pytest.approx(8.0)


class TestContourSmootherConfigBase:
    def test_abc_base(self):
        from darsia_tpu.presets.workflows.config import (
            ContourSmootherConfig,
            SavitzkyGolaySmootherConfig,
        )

        cfg = SavitzkyGolaySmootherConfig().load({"window_length": 11})
        assert isinstance(cfg, ContourSmootherConfig)
        assert cfg.window_length == 11 and cfg.polyorder == 3
