"""Label-map editing assistant: segment / merge / pick / refine.

Parity: reference ``assistants/labels_assistant.py:111-650``.  The
menu-driven interactive loop is replaced by direct module methods; each
module also works headless with explicit inputs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..image.image import Image
from ..utils.segmentation import label_image, segment
from .base_assistant import BaseAssistant
from .selection_assistants import PointSelectionAssistant

__all__ = [
    "LabelsSegmentAssistant",
    "LabelsMaskSelectionAssistant",
    "LabelsPickAssistant",
    "LabelsMergeAssistant",
    "LabelsAssistant",
    "LabelsAssistantMenu",
    "MonochromaticAssistant",
]


def _labels_image(template, data) -> Image:
    meta = template.metadata()
    meta["scalar"] = True
    meta.pop("color_space", None)
    return Image(np.asarray(data).astype(np.int32), **meta)


class LabelsSegmentAssistant:
    """(Re-)segment a region of the background image via watershed."""

    def __init__(self, labels, background, mask=None, **kwargs) -> None:
        self.labels = labels
        self.background = background
        self.mask = None if mask is None else np.asarray(mask, dtype=bool)
        self.kwargs = kwargs

    def __call__(self, marker_points=None) -> Image:
        kwargs = {
            k: v for k, v in self.kwargs.items() if k != "marker_points"
        }
        new_labels = segment(
            self.background,
            markers_method="supervised" if marker_points else "gradient_based",
            edges_method="scharr",
            mask=self.mask,
            marker_points=marker_points,
            **kwargs,
        )
        new_arr = np.asarray(
            new_labels.img if hasattr(new_labels, "img") else new_labels
        )
        if self.labels is None or self.mask is None:
            return _labels_image(self.background, new_arr)
        # Splice the re-segmented region into the existing labels.
        old = np.asarray(self.labels.img).copy()
        offset = old.max() + 1
        old[self.mask] = new_arr[self.mask] + offset
        # Re-enumerate to consecutive ids.
        _, consecutive = np.unique(old, return_inverse=True)
        return _labels_image(self.labels, consecutive.reshape(old.shape))


class LabelsMaskSelectionAssistant:
    """Pick labels (by point or id) and return their union mask."""

    def __init__(self, labels, background=None, **kwargs) -> None:
        self.labels = labels
        self.background = background
        self.kwargs = kwargs

    def __call__(self, points=None, ids=None) -> np.ndarray:
        labels_arr = np.asarray(self.labels.img)
        mask = np.zeros(labels_arr.shape, dtype=bool)
        if ids is None:
            assert points is not None, (
                "Provide points or ids (interactive picking unavailable "
                "headless)."
            )
            ids = [
                int(labels_arr[int(p[0]), int(p[1])]) for p in points
            ]
        for label in ids:
            mask |= labels_arr == label
        return mask


class LabelsPickAssistant:
    """Pick label regions by clicking; returns the selected-region image."""

    def __init__(self, labels, background=None, **kwargs) -> None:
        self.labels = labels
        self.background = background
        self.kwargs = kwargs

    def __call__(self, points=None, ids=None) -> Image:
        mask = LabelsMaskSelectionAssistant(self.labels, self.background)(
            points=points, ids=ids
        )
        out = self.labels.copy()
        arr = np.asarray(out.img).copy()
        arr[~mask] = 0
        out.img = arr
        return out


class LabelsMergeAssistant:
    """Merge a set of labels into one."""

    def __init__(self, labels, background=None, **kwargs) -> None:
        self.labels = labels
        self.background = background

    def __call__(self, points=None, ids=None) -> Image:
        labels_arr = np.asarray(self.labels.img).copy()
        if ids is None:
            assert points is not None, "Provide points or ids."
            ids = [int(labels_arr[int(p[0]), int(p[1])]) for p in points]
        target = min(ids)
        for label in ids:
            labels_arr[labels_arr == label] = target
        _, consecutive = np.unique(labels_arr, return_inverse=True)
        return _labels_image(self.labels, consecutive.reshape(labels_arr.shape))


class LabelsAssistant:
    """Facade bundling the label-editing modules
    (reference labels_assistant.py:420-650; the interactive menu becomes
    direct method calls)."""

    def __init__(self, labels=None, background=None, **kwargs) -> None:
        self.labels = labels
        self.background = background
        self.kwargs = kwargs

    def segment(self, mask=None, marker_points=None) -> Image:
        self.labels = LabelsSegmentAssistant(
            self.labels, self.background, mask=mask, **self.kwargs
        )(marker_points=marker_points)
        return self.labels

    def refine(self, ids=None, points=None, marker_points=None) -> Image:
        mask = LabelsMaskSelectionAssistant(self.labels, self.background)(
            points=points, ids=ids
        )
        self.labels = LabelsSegmentAssistant(
            self.labels, self.background, mask=mask, **self.kwargs
        )(marker_points=marker_points)
        return self.labels

    def pick(self, ids=None, points=None) -> Image:
        return LabelsPickAssistant(self.labels, self.background)(
            points=points, ids=ids
        )

    def merge(self, ids=None, points=None) -> Image:
        self.labels = LabelsMergeAssistant(self.labels, self.background)(
            points=points, ids=ids
        )
        return self.labels

    def __call__(self) -> Image:
        if self.labels is None:
            return self.segment()
        return self.labels


class LabelsAssistantMenu(BaseAssistant):
    """Interactive key-press menu of the reference LabelsAssistant
    (reference labels_assistant.py:12-110).  Headless callers use the
    direct LabelsAssistant methods instead."""

    _ACTIONS = {
        "s": "segment",
        "r": "refine",
        "p": "pick",
        "m": "merge",
        "e": "escape",
    }

    def __init__(self, img, background=None, **kwargs) -> None:
        super().__init__(img, **kwargs)
        self.background = background
        self.action = None

    def _print_instructions(self) -> None:
        print("LabelsAssistant menu: s=segment r=refine p=pick m=merge e=exit")

    def _on_key_press(self, event) -> None:
        if event.key in self._ACTIONS:
            self.action = self._ACTIONS[event.key]
            import matplotlib.pyplot as plt

            plt.close(self.fig)

    def __call__(self) -> str:
        self.action = None
        super().__call__()
        return self.action


class MonochromaticAssistant:
    """Pick a monochromatic representation of a color image.

    Reference labels_assistant.py:204-288 cycles channels interactively;
    headless callers pass ``color`` directly.
    """

    def __init__(self, img, color: str = "gray", **kwargs) -> None:
        self.img = img
        self.color = color

    def __call__(self):
        from ..signals.reduction.signalreduction import MonochromaticReduction

        reduction = MonochromaticReduction(color=self.color)
        out = self.img.copy()
        out.img = reduction(self.img.img)
        return out
