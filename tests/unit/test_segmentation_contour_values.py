"""Workflow segmentation contour value labels.

Mirrors reference ``tests/unit/test_segmentation_contour_values.py``:
config defaults/inheritance and the ``add_contour_values`` overlay.
"""

from __future__ import annotations

import types

import numpy as np

from darsia_tpu.presets.workflows.config.segmentation import SegmentationConfig
from darsia_tpu.presets.workflows.segmentation_contours import (
    SegmentationContours,
)


def _circle_mask(n: int = 120, radius: int = 35) -> np.ndarray:
    yy, xx = np.ogrid[:n, :n]
    return (((xx - n // 2) ** 2 + (yy - n // 2) ** 2) < radius**2).astype(
        np.uint8
    )


def test_value_labels_defaults():
    """Default value-label settings; value_color inherits the contour
    color (reference behavior)."""
    cfg = SegmentationConfig().load(
        {
            "label": "phase",
            "mode": "mass",
            "thresholds": [0.5],
            "color": [255, 0, 0],
        }
    )
    assert cfg.values.show_values is False
    assert cfg.values.value_color == [255, 0, 0]
    assert cfg.values.value_size == 0.5
    assert cfg.values.value_alpha == 1.0
    assert cfg.values.value_max_per_contour == 3


def test_value_labels_nested_override():
    cfg = SegmentationConfig().load(
        {
            "label": "phase",
            "mode": "mass",
            "thresholds": [0.5],
            "color": [255, 0, 0],
            "values": {
                "show_values": True,
                "value_color": [0, 255, 0],
                "value_size": 0.8,
                "value_max_per_contour": 1,
            },
        }
    )
    assert cfg.values.show_values is True
    assert cfg.values.value_color == [0, 255, 0]
    assert cfg.values.value_size == 0.8
    assert cfg.values.value_max_per_contour == 1


def test_contour_value_labels_change_rendered_image():
    """Stamping labels mutates pixels; alpha blending scales the effect."""
    base = np.zeros((120, 120, 3), np.uint8)
    mask = _circle_mask()
    values_config = types.SimpleNamespace(
        value_alpha=1.0,
        value_size=0.5,
        value_min_distance_px=20.0,
        value_max_per_contour=2,
        value_format="{:.2f}",
        value_color=[255, 0, 0],
    )
    contours = SegmentationContours.__new__(SegmentationContours)
    labeled = contours.add_contour_values(base, [mask], [0.5], values_config)
    assert labeled.shape == base.shape
    assert int(labeled.sum()) > 0  # text was drawn
    # Only the configured channel is touched.
    assert labeled[..., 0].sum() > 0
    assert labeled[..., 1].sum() == 0

    faded_config = types.SimpleNamespace(**vars(values_config))
    faded_config.value_alpha = 0.25
    faded = contours.add_contour_values(base, [mask], [0.5], faded_config)
    assert 0 < faded.sum() < labeled.sum()


def test_contour_value_labels_respect_spacing_and_cap():
    """At most value_max_per_contour labels, spaced by the minimum
    distance (reference _select_label_positions contract)."""
    import cv2

    base = np.zeros((120, 120, 3), np.uint8)
    mask = _circle_mask()
    one_config = types.SimpleNamespace(
        value_alpha=1.0,
        value_size=0.4,
        value_min_distance_px=1000.0,  # suppress all but one
        value_max_per_contour=5,
        value_format="{:.1f}",
        value_color=[255, 255, 255],
    )
    contours = SegmentationContours.__new__(SegmentationContours)
    one = contours.add_contour_values(base, [mask, mask], [0.1, 0.9], one_config)
    # Second threshold's labels are suppressed by the huge spacing.
    many_config = types.SimpleNamespace(**vars(one_config))
    many_config.value_min_distance_px = 5.0
    many = contours.add_contour_values(
        base, [mask, mask], [0.1, 0.9], many_config
    )
    assert many.sum() > one.sum()


def test_image_wrapper_roundtrip():
    """Image inputs come back as Images with the overlay applied."""
    import darsia_tpu as da

    base = da.OpticalImage(
        np.zeros((120, 120, 3), np.uint8), width=1.0, height=1.0
    )
    mask = _circle_mask()
    values_config = types.SimpleNamespace(
        value_alpha=1.0,
        value_size=0.5,
        value_min_distance_px=20.0,
        value_max_per_contour=1,
        value_format="{:.2f}",
        value_color=[255, 0, 0],
    )
    contours = SegmentationContours.__new__(SegmentationContours)
    out = contours.add_contour_values(base, [mask], [0.5], values_config)
    assert hasattr(out, "img")
    assert np.asarray(out.img).sum() > 0
