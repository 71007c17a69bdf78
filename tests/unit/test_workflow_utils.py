"""Workflow utils: streaming encoder, ROI visualization, media builders,
download planner, calibration bundles (reference
presets/workflows/utils/* + analysis/streaming.py)."""

import numpy as np
import pytest

import darsia_tpu as da
from darsia_tpu.presets.workflows.analysis.streaming import (
    encode_low_resolution_png,
    publish_preview,
)
from darsia_tpu.presets.workflows.utils.roi_visualization import (
    build_active_mask_from_rois,
    render_active_region,
)


class TestStreaming:
    def test_encode_low_resolution_png_roundtrip(self):
        import cv2

        rng = np.random.default_rng(0)
        img = rng.random((256, 384, 3)).astype(np.float32)
        payload = encode_low_resolution_png(img, max_width=128)
        assert isinstance(payload, (bytes, bytearray))
        decoded = cv2.imdecode(
            np.frombuffer(payload, np.uint8), cv2.IMREAD_COLOR
        )
        assert decoded is not None
        assert decoded.shape[1] <= 128

    def test_publish_preview_callback(self):
        events = []
        rng = np.random.default_rng(1)
        img = rng.random((64, 64, 3)).astype(np.float32)
        publish_preview(events.append, img)
        assert len(events) == 1
        assert isinstance(events[0], (bytes, bytearray))

    def test_publish_preview_none_callback_is_noop(self):
        publish_preview(None, np.zeros((8, 8, 3)))

    def test_publish_stream_images_dict_payload(self):
        from darsia_tpu.presets.workflows.analysis.streaming import (
            publish_stream_images,
        )

        events = []
        rng = np.random.default_rng(2)
        publish_stream_images(
            events.append,
            {"mass": rng.random((32, 32, 3)).astype(np.float32), "skip": None},
        )
        assert len(events) == 1
        (payload,) = events
        assert set(payload) == {"mass"}
        assert isinstance(payload["mass"], (bytes, bytearray))


class TestRoiVisualization:
    def test_active_mask_and_render(self):
        img = da.OpticalImage(
            np.full((32, 32, 3), 0.8, np.float32), width=1.0, height=1.0
        )

        class RoiCfg:
            roi = np.array([[0.2, 0.2], [0.6, 0.6]])

        mask = build_active_mask_from_rois({"left": RoiCfg()}, img)
        assert mask.dtype == bool and mask.any() and not mask.all()
        rendered = render_active_region(img, mask, dim_factor=0.5)
        arr = np.asarray(rendered.image)
        # Outside the active region the image is dimmed.
        assert arr[~mask].mean() < arr[mask].mean()
        assert rendered.mask.shape == mask.shape
        # Boundary contours are extracted for a partial mask.
        assert len(rendered.contours) > 0


class TestDownloadPlanner:
    def test_prepare_download_plan(self, tmp_path):
        from darsia_tpu.presets.workflows.utils.utils_download import (
            download_data,
            prepare_download_data,
        )

        source = tmp_path / "archive"
        source.mkdir()
        (source / "run_a.npz").write_bytes(b"x" * 100)
        (source / "run_b.npz").write_bytes(b"y" * 50)
        target = tmp_path / "data"
        config = tmp_path / "config.toml"
        config.write_text(
            f"""
[data]
folder = "{target}"
results = "{tmp_path / 'results'}"

[download]
source = "{source}"
folder = "{target}"
"""
        )
        plan = prepare_download_data(config)
        assert len(plan.items) == 2
        assert isinstance(plan.describe(), str)
        # dry_run plans without copying anything.
        download_data(config, dry_run=True)
        assert not target.exists() or not list(target.iterdir())
        # Real run copies the files; skip_existing makes a re-plan empty.
        download_data(config)
        assert (target / "run_a.npz").read_bytes() == b"x" * 100
        assert len(prepare_download_data(config).items) == 0


class TestMediaBuilder:
    def test_build_media_from_npz_frames(self, tmp_path):
        import cv2

        frames = tmp_path / "frames"
        frames.mkdir()
        for i in range(3):
            arr = np.full((32, 48, 3), 60 + 60 * i, np.uint8)
            cv2.imwrite(str(frames / f"frame_{i:02d}.jpg"), arr)
        out = tmp_path / "media"
        config = tmp_path / "config.toml"
        config.write_text(
            f"""
[data]
folder = "{tmp_path}"
results = "{tmp_path / 'results'}"

[video]
source = "{frames}"
folder = "{out}"

[video.output]
formats = ["mp4"]
fps = 2
filename = "run"
"""
        )
        from darsia_tpu.presets.workflows.utils.utils_media import build_media

        result = build_media(config)
        assert "mp4" in result
        assert result["mp4"] == out / "run.mp4"
        assert result["mp4"].exists() and result["mp4"].stat().st_size > 0

    def test_build_media_requires_output_folder(self, tmp_path):
        import cv2

        frames = tmp_path / "frames"
        frames.mkdir()
        cv2.imwrite(
            str(frames / "frame_00.jpg"), np.zeros((16, 16, 3), np.uint8)
        )
        config = tmp_path / "config.toml"
        # No [data].results and no [video].folder: must refuse rather than
        # silently writing into the current working directory.
        config.write_text(
            f"""
[video]
source = "{frames}"
"""
        )
        from darsia_tpu.presets.workflows.utils.utils_media import build_media

        with pytest.raises(ValueError, match="folder"):
            build_media(config)
