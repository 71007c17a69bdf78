"""Contour analysis of segmented regions.

Parity: reference
``src/darsia/single_image_analysis/contouranalysis.py:25-616``.  Contour
extraction is host cv2 (control-flow heavy, setup path); measures are
vectorized numpy.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

__all__ = ["contour_length", "ContourAnalysis"]


def _find_contours(mask: np.ndarray) -> list[np.ndarray]:
    import cv2

    contours, _ = cv2.findContours(
        mask.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE
    )
    return list(contours)


def contour_length(
    img,
    roi: Optional[tuple] = None,
    values_of_interest: Union[int, list[int], bool] = True,
    fill_holes: bool = True,
    verbosity: bool = False,
    return_contours: bool = False,
):
    """Total physical length of the contour of a (masked) region.

    Args:
        img: boolean/labelled image (Image or array).
        roi: optional voxel ROI restricting the analysis.
        values_of_interest: mask values considered part of the region.
        fill_holes: fill interior holes before measuring.

    Returns:
        float length (meters if a physical Image is given, else pixels);
        optionally also the contours.

    """
    data = np.asarray(img.img if hasattr(img, "img") else img)
    if roi is not None:
        data = data[roi]
    if isinstance(values_of_interest, (int, list)):
        voi = (
            [values_of_interest]
            if isinstance(values_of_interest, int)
            else values_of_interest
        )
        mask = np.isin(data, voi)
    else:
        mask = data.astype(bool)

    if fill_holes:
        from ..utils.morphology import binary_fill_holes

        mask = binary_fill_holes(mask)

    contours = _find_contours(mask)
    length_pixels = 0.0
    import cv2

    for c in contours:
        length_pixels += cv2.arcLength(c, closed=True)

    if hasattr(img, "voxel_size"):
        # Convert with the mean voxel size (isotropic warps assumed).
        scale = float(np.mean(img.voxel_size[:2]))
        length = length_pixels * scale
    else:
        length = length_pixels
    if return_contours:
        return length, contours
    return length


class ContourAnalysis:
    """Analysis of interface contours: length, peaks (fingers), valleys."""

    def __init__(
        self,
        verbosity: bool = False,
        contour_smoother=None,
        reduce_to_main_contour: bool = False,
    ) -> None:
        self.verbosity = verbosity
        self.contour_smoother = contour_smoother
        self.reduce_to_main_contour = reduce_to_main_contour
        self.img = None
        self._mask = None

    def load_labels(
        self,
        img,
        roi: Optional[tuple] = None,
        values_of_interest: Union[int, list[int], bool] = True,
        fill_holes: bool = True,
    ) -> None:
        """Load a (labelled) image and build the analysis mask."""
        self.img = img
        data = np.asarray(img.img if hasattr(img, "img") else img)
        self.roi = roi
        if roi is not None:
            data = data[roi]
        if isinstance(values_of_interest, (int, list)):
            voi = (
                [values_of_interest]
                if isinstance(values_of_interest, int)
                else values_of_interest
            )
            mask = np.isin(data, voi)
        else:
            mask = data.astype(bool)
        if fill_holes:
            from ..utils.morphology import binary_fill_holes

            mask = binary_fill_holes(mask)
        self._mask = mask

    def load(
        self,
        img,
        mask=None,
        roi=None,
        fill_holes: bool = False,
    ) -> None:
        """Load image + boolean mask (reference contouranalysis.py:153).

        With ``mask=None`` falls back to the label-based loading of
        :meth:`load_labels` (interpreting ``img`` itself as the mask
        source), so both historic call styles work.
        """
        if mask is None:
            self.load_labels(img, roi=roi, fill_holes=fill_holes)
            return
        self.img = img
        mask_img = mask.subregion(roi) if roi is not None else mask
        data = np.asarray(
            mask_img.img if hasattr(mask_img, "img") else mask_img
        ).astype(bool)
        if fill_holes:
            from ..utils.morphology import binary_fill_holes

            data = binary_fill_holes(data)
        self.roi = roi
        self._mask = data

    def contours(self) -> list[np.ndarray]:
        assert self._mask is not None, "Call load() first."
        contours = _find_contours(self._mask)
        if self.reduce_to_main_contour and len(contours) > 1:
            import cv2

            areas = [cv2.contourArea(c) for c in contours]
            contours = [contours[int(np.argmax(areas))]]
        if self.contour_smoother is not None:
            contours = [self.contour_smoother(c) for c in contours]
        return contours

    def length(self) -> float:
        assert self._mask is not None, "Call load() first."
        import cv2

        total = sum(cv2.arcLength(c, True) for c in self.contours())
        if hasattr(self.img, "voxel_size"):
            return total * float(np.mean(self.img.voxel_size[:2]))
        return total

    def local_extrema(
        self, direction: Optional[np.ndarray] = None, min_distance: int = 5
    ):
        """Peaks and valleys of the region boundary along a direction.

        Args:
            direction: 2-vector in (col, row) convention; default upward
                (-row), suiting gravity-driven finger analysis.
            min_distance: minimal sample distance between extrema.

        Returns:
            (peaks, valleys): voxel positions (N, 2) each.

        """
        assert self._mask is not None, "Call load() first."
        if direction is None:
            direction = np.array([0.0, -1.0])  # (dx, dy): upward fingers
        peaks_all, valleys_all = [], []
        for c in self.contours():
            pts = c[:, 0, :]  # (N, 2) in (col, row)
            proj = pts[:, 0] * direction[0] + pts[:, 1] * direction[1]
            n = len(proj)
            if n < 3:
                continue
            prev = np.roll(proj, 1)
            nxt = np.roll(proj, -1)
            is_peak = (proj > prev) & (proj >= nxt)
            is_valley = (proj < prev) & (proj <= nxt)
            peaks = pts[is_peak]
            valleys = pts[is_valley]
            peaks_all.extend(self._suppress(peaks, min_distance))
            valleys_all.extend(self._suppress(valleys, min_distance))
        peaks_arr = np.array(peaks_all).reshape(-1, 2)
        valleys_arr = np.array(valleys_all).reshape(-1, 2)
        # Return in (row, col) voxel convention.
        return peaks_arr[:, ::-1], valleys_arr[:, ::-1]

    @staticmethod
    def _suppress(pts: np.ndarray, min_distance: int) -> list:
        kept: list = []
        for p in pts:
            if all(np.linalg.norm(p - q) >= min_distance for q in kept):
                kept.append(p)
        return kept

    def number_peaks(self) -> int:
        peaks, _ = self.local_extrema()
        return len(peaks)

    def number_valleys(self) -> int:
        _, valleys = self.local_extrema()
        return len(valleys)

    def plot_peaks(self, **kwargs) -> None:  # pragma: no cover - visual
        import matplotlib.pyplot as plt

        peaks, _ = self.local_extrema()
        plt.imshow(self._mask)
        plt.scatter(peaks[:, 1], peaks[:, 0], c="r", marker="x")
        plt.show()

    def plot_valleys(self, **kwargs) -> None:  # pragma: no cover - visual
        import matplotlib.pyplot as plt

        _, valleys = self.local_extrema()
        plt.imshow(self._mask)
        plt.scatter(valleys[:, 1], valleys[:, 0], c="b", marker="o")
        plt.show()
