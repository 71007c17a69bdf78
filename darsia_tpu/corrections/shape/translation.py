"""Translation estimation and correction.

Parity: reference ``src/darsia/corrections/shape/translation.py:16-421``.

TPU-native deviation: the reference estimates translations with ORB feature
matching + RANSAC homographies (OpenCV, control-flow heavy, stochastic).
Here the estimator is **FFT phase correlation** (:mod:`darsia_tpu.ops.fft`)
— deterministic, jittable, batchable over patches, and numerically
equivalent for near-rigid translations.  The constructor keeps the reference
signature (feature-count knobs are accepted and ignored).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from ...ops.color import rgb_to_gray
from ...ops.fft import phase_correlation
from ...ops.warp import identity_grid, warp_backend
from ..base import BaseCorrection

__all__ = ["TranslationEstimator", "TranslationCorrection"]


def _to_gray(img: jnp.ndarray) -> jnp.ndarray:
    if img.ndim == 3:
        return rgb_to_gray(img.astype(jnp.float32))
    return img.astype(jnp.float32)


def translate_array(
    img: jnp.ndarray, translation_xy: np.ndarray, order: int = 1
) -> jnp.ndarray:
    """Shift an image by (dx, dy) = (col, row) displacement (push-forward).

    Matches cv2.warpAffine semantics with an identity-plus-translation
    matrix: output(p) = input(p - t).
    """
    dx, dy = float(translation_xy[0]), float(translation_xy[1])
    spatial = tuple(img.shape[:2])
    coords = identity_grid(spatial)
    coords = coords.at[0].add(-dy).at[1].add(-dx)
    dtype = img.dtype
    max_disp = int(np.ceil(max(abs(dx), abs(dy)))) + 1
    out = warp_backend(
        jnp.asarray(img).astype(jnp.float32), coords, order=order,
        max_disp=max_disp,
    )
    if jnp.issubdtype(dtype, jnp.integer):
        out = jnp.round(out)
    return out.astype(dtype)


class TranslationEstimator:
    """Estimate an effective translation aligning two images on a ROI."""

    def __init__(
        self, max_features: int = 200, tol: float = 0.05, keep_percent: float = 0.1
    ) -> None:
        # Knobs kept for API parity; phase correlation needs none of them.
        self.max_features = max_features
        self.tol = tol
        self.keep_percent = keep_percent

    def find_effective_translation(
        self,
        img_src,
        img_dst,
        roi_src: Optional[tuple] = None,
        roi_dst: Optional[tuple] = None,
        plot_matches: bool = False,
    ) -> tuple[np.ndarray, bool]:
        """Translation (dx, dy) aligning img_src to img_dst.

        Returns:
            tuple: translation in (x=col, y=row) order, and success flag.

        """
        a = _to_gray(jnp.asarray(img_src))
        b = _to_gray(jnp.asarray(img_dst))
        if roi_src is not None:
            a = a[roi_src[0], roi_src[1]]
        if roi_dst is not None:
            b = b[roi_dst[0], roi_dst[1]]
        # Harmonize shapes (phase correlation needs equal windows).
        h = min(a.shape[0], b.shape[0])
        w = min(a.shape[1], b.shape[1])
        if h < 2 or w < 2:
            return np.zeros(2), False
        a = a[:h, :w]
        b = b[:h, :w]
        shift, quality = phase_correlation(a, b)
        shift = np.asarray(shift)
        # ROI offsets contribute when src and dst windows differ.
        offset = np.zeros(2)
        if roi_src is not None and roi_dst is not None:
            offset = np.array(
                [
                    (roi_dst[0].start or 0) - (roi_src[0].start or 0),
                    (roi_dst[1].start or 0) - (roi_src[1].start or 0),
                ]
            )
        drow, dcol = shift[0] + offset[0], shift[1] + offset[1]
        translation = np.array([dcol, drow])
        intact = bool(np.isfinite(translation).all())
        return translation, intact

    def match_roi(
        self,
        img_src,
        img_dst,
        roi_src: Optional[tuple] = None,
        roi_dst: Optional[tuple] = None,
    ):
        """Align img_src with img_dst via translation estimated on ROIs."""
        translation, intact = self.find_effective_translation(
            img_src, img_dst, roi_src, roi_dst
        )
        if not intact:
            return img_src
        return translate_array(jnp.asarray(img_src), translation)


class TranslationCorrection(BaseCorrection):
    """Apply a fixed translation (possibly loaded from file)."""

    def __init__(
        self, translation: Optional[Union[str, Path, np.ndarray, list]] = None
    ) -> None:
        if isinstance(translation, (str, Path)):
            self.load(translation)
        elif translation is not None:
            self.translation = np.asarray(translation, dtype=float)
        else:
            self.translation = np.zeros(2)

    def correct_array(self, img: jnp.ndarray) -> jnp.ndarray:
        return translate_array(jnp.asarray(img), self.translation)

    def pullback_field(self, input_shape: tuple):
        """Static pull-back field: identity minus the translation (fusion
        protocol, see :mod:`darsia_tpu.corrections.fuse`)."""
        shape = tuple(int(s) for s in input_shape)
        shift = jnp.array(
            [-float(self.translation[1]), -float(self.translation[0])],
            dtype=jnp.float32,
        )
        coords = identity_grid(shape) + shift.reshape((2,) + (1,) * len(shape))
        return coords, {}

    def save(self, path) -> None:
        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(path, class_name=type(self).__name__, translation=self.translation)

    def load(self, path) -> None:
        data = np.load(Path(path), allow_pickle=True)
        self.translation = data["translation"]
