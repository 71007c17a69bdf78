"""Tests for headless assistants."""

import numpy as np
import pytest

import darsia_tpu as da


@pytest.fixture
def img():
    rng = np.random.default_rng(0)
    return da.Image(
        rng.uniform(0.3, 0.6, (60, 90, 3)).astype(np.float32),
        width=1.8,
        height=1.2,
        color_space="RGB",
    )


def test_point_selection_programmatic(img):
    pts = da.PointSelectionAssistant(img, points=[[10, 20], [30, 40]])()
    assert np.allclose(np.asarray(pts), [[10, 20], [30, 40]])


def test_point_selection_headless_guard(img):
    with pytest.raises(RuntimeError, match="interactive"):
        da.PointSelectionAssistant(img)()


def test_box_selection(img):
    boxes = da.BoxSelectionAssistant(img, width=10, points=[[30, 45]])()
    assert boxes == [(slice(25, 35), slice(40, 50))]


def test_rectangle_selection(img):
    box = da.RectangleSelectionAssistant(
        img, corners=[[10, 20], [30, 50]]
    )()
    assert box == (slice(10, 30), slice(20, 50))


def test_crop_assistant_from_image(img):
    arr = np.asarray(img.img).copy()
    for r, c in [(3, 3), (56, 4), (57, 86), (2, 85)]:
        arr[r - 1:r + 2, c - 1:c + 2] = [1.0, 0.0, 1.0]
    marked = da.Image(arr, width=1.8, height=1.2, color_space="RGB")
    cfg = da.CropAssistant(marked, width=1.8, height=1.2).from_image(
        color=[1.0, 0.0, 1.0]
    )
    pts = np.asarray(cfg["crop"]["pts_src"])
    assert pts.shape == (4, 2)
    # TL, BL, BR, TR ordering near the painted marks.
    assert np.linalg.norm(pts[0] - [3, 3]) < 3
    assert np.linalg.norm(pts[2] - [57, 86]) < 3
    cropped = da.CurvatureCorrection(config=cfg)(marked)
    assert np.asarray(cropped.img).ndim == 3


def test_labels_assistant_roundtrip(img):
    la = da.LabelsAssistant(background=img)
    labels = la.segment(marker_points=[[15, 20], [45, 70]])
    assert len(np.unique(np.asarray(labels.img))) >= 2
    merged = la.merge(ids=np.unique(np.asarray(labels.img))[:2].tolist())
    assert len(np.unique(np.asarray(merged.img))) >= 1
    mask = da.LabelsMaskSelectionAssistant(merged)(points=[[15, 20]])
    assert mask[15, 20]


def test_rotation_assistant(img):
    corrections = da.RotationCorrectionAssistant(
        img, points=[[30, 10], [33, 80]]
    )()
    assert len(corrections) == 1
    out = corrections[0](img)
    assert np.asarray(out.img).shape == np.asarray(img.img).shape


def test_subregion_assistant(img):
    coords = da.SubregionAssistant(
        img, coordinates=[[0.2, 0.2], [1.0, 1.0]]
    )()
    assert coords.shape == (2, 2)
