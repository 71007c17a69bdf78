"""Curvature correction — crop + bulge + stretch polynomial warps.

Parity: reference ``src/darsia/corrections/shape/curvature.py:166-986``.

TPU-native design: the correction is a **coordinate-field generator**.  The
pull-back sampling grid is precomputed once per input shape by pushing the
identity coordinate images through the configured steps
(init -> crop -> bulge -> stretch) — all as jitted array ops — and cached as
a device array.  ``correct_array`` is then a single fused gather (the shared
warp kernel): the whole multi-step pipeline costs one resampling pass per
image, for any number of configured steps.

Config schema (dict / json / toml section "curvature"):

* ``init``/``bulge``: horizontal/vertical_bulge, *_center_offset
* ``crop``: pts_src (4 corner voxels, (row, col), TL-BL-BR-TR order),
  width, height
* ``stretch``: horizontal/vertical_stretch, *_center_offset
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Optional, Union
from warnings import warn

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.point import make_voxel
from ...ops.warp import warp
from ..base import BaseCorrection
from .quad import extract_quadrilateral_ROI

__all__ = [
    "CurvatureCorrection",
    "load_curvature_correction_config_from_toml",
    "load_curvature_correction_config_from_dict",
]


def _normalize_section(sec: dict, keys: dict) -> dict:
    return {k: sec.get(k, default) for k, default in keys.items()}


def load_curvature_correction_config_from_dict(sec: dict) -> dict:
    """Normalize a curvature config dict (see module docstring for schema)."""
    config: dict = {}
    if sec.get("init") is not None and "init" in sec:
        config["init"] = _normalize_section(
            sec["init"],
            {
                "horizontal_bulge": 0.0,
                "vertical_bulge": 0.0,
                "horizontal_center_offset": 0,
                "vertical_center_offset": 0,
            },
        )
    if sec.get("crop") is not None and "crop" in sec:
        config["crop"] = {
            "pts_src": make_voxel(sec["crop"].get("pts_src", [])),
            "width": sec["crop"].get("width", 1.0),
            "height": sec["crop"].get("height", 1.0),
            "in meters": sec["crop"].get("in meters", True),
        }
    if sec.get("bulge") is not None and "bulge" in sec:
        config["bulge"] = _normalize_section(
            sec["bulge"],
            {
                "horizontal_bulge": 0.0,
                "horizontal_center_offset": 0,
                "vertical_bulge": 0.0,
                "vertical_center_offset": 0,
            },
        )
    if sec.get("stretch") is not None and "stretch" in sec:
        config["stretch"] = _normalize_section(
            sec["stretch"],
            {
                "horizontal_stretch": 0.0,
                "horizontal_center_offset": 0,
                "vertical_stretch": 0.0,
                "vertical_center_offset": 0,
            },
        )
    return config


def load_curvature_correction_config_from_toml(path: Path) -> dict:
    """Load a curvature config from the ``[curvature]`` section of a toml."""
    import tomllib

    data = tomllib.loads(Path(path).read_text())
    if "curvature" not in data:
        warn(f"No 'curvature' section found in {path}.")
        return {}
    return load_curvature_correction_config_from_dict(data["curvature"])


class CurvatureCorrection(BaseCorrection):
    """Polynomial curvature correction (crop/bulge/stretch)."""

    def __init__(
        self,
        config: Union[dict, str, Path, list, None] = None,
        **kwargs,
    ) -> None:
        self.setup_config(config)

        if "image" in kwargs:
            im_source = kwargs["image"]
            if isinstance(im_source, np.ndarray):
                self.reference_image = im_source
            elif isinstance(im_source, (str, Path)):
                import cv2

                img = cv2.imread(str(im_source), cv2.IMREAD_UNCHANGED)
                self.reference_image = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            else:
                raise ValueError("Provide a path or an array as image.")
            self.current_image = np.copy(self.reference_image)
            self.in_meters = kwargs.get("in_meters", True)
            self.width = kwargs.get("width", 1.0)
            self.height = kwargs.get("height", 1.0)

        self.resize_factor = kwargs.get("resize_factor", 1.0)
        if not math.isclose(self.resize_factor, 1.0):
            self._adapt_config()

        self.interpolation_order: int = kwargs.get("interpolation_order", 1)
        self.cache: dict = {}

    # -------------------------------------------------------------- config

    def setup_config(self, config=None) -> None:
        def _read_file(path: Path) -> dict:
            if path.suffix == ".json":
                with open(path, "r") as f:
                    return load_curvature_correction_config_from_dict(json.load(f))
            if path.suffix == ".toml":
                return load_curvature_correction_config_from_toml(path)
            raise ValueError(f"Unsupported config file {path}.")

        if config is None:
            self.config = {}
        elif isinstance(config, dict):
            self.config = load_curvature_correction_config_from_dict(config)
        elif isinstance(config, (str, Path)):
            self.config = _read_file(Path(config))
        elif isinstance(config, list):
            self.config = {}
            for p in config:
                self.config.update(_read_file(Path(p)))
        else:
            raise ValueError("Unsupported config type.")

    def write_config_to_file(self, path) -> None:
        cfg = json.loads(json.dumps(self.config, default=lambda o: np.asarray(o).tolist()))
        with open(Path(path), "w") as outfile:
            json.dump(cfg, outfile, indent=4)

    def read_config_from_file(self, path) -> None:
        with open(Path(path), "r") as f:
            self.config = load_curvature_correction_config_from_dict(json.load(f))

    def _adapt_config(self) -> None:
        """Rescale config for a resized input (resize_factor != 1)."""
        for mainkey in ("init", "bulge"):
            if mainkey in self.config:
                for key in (
                    "horizontal_bulge",
                    "vertical_bulge",
                    "horizontal_center_offset",
                    "vertical_center_offset",
                ):
                    if key in self.config[mainkey]:
                        self.config[mainkey][key] *= self.resize_factor
        if "crop" in self.config:
            self.config["crop"]["pts_src"] = make_voxel(
                self.resize_factor * np.asarray(self.config["crop"]["pts_src"])
            )
        if "stretch" in self.config:
            for key in (
                "horizontal_stretch",
                "vertical_stretch",
                "horizontal_center_offset",
                "vertical_center_offset",
            ):
                self.config["stretch"][key] *= self.resize_factor

    # ----------------------------------------- interactive tuning wrappers

    @property
    def temporary_image(self) -> np.ndarray:
        """Current tuning image as an integer image (reference
        curvature.py:366-370: uint16 stays uint16, everything else is
        returned as uint8)."""
        img = np.asarray(self.current_image)
        if img.dtype == np.uint16:
            return img
        if img.dtype == np.uint8:
            return img
        scaled = np.clip(np.asarray(img, dtype=float), 0.0, 1.0) * 255.0
        return scaled.astype(np.uint8)

    def show_image(self) -> None:  # pragma: no cover - visual
        """Show the current tuning image (reference curvature.py:358-363)."""
        import matplotlib.pyplot as plt

        img = np.asarray(self.current_image)
        if np.issubdtype(img.dtype, np.floating):
            img = np.clip(img, 0, 1)
        plt.imshow(img)
        plt.show()

    def pre_bulge_correction(self, **kwargs) -> None:
        """Set the 'init' bulge step and apply it to the tuning image."""
        self.config["init"] = {
            "horizontal_bulge": kwargs.get("horizontal_bulge", 0),
            "horizontal_center_offset": kwargs.get("horizontal_center_offset", 0),
            "vertical_bulge": kwargs.get("vertical_bulge", 0),
            "vertical_center_offset": kwargs.get("vertical_center_offset", 0),
        }
        self.current_image = np.asarray(
            self.simple_curvature_correction(self.current_image, **self.config["init"])
        )

    def crop(self, corner_points) -> None:
        """Set the crop step from 4 corner voxels and apply to tuning image."""
        self.config["crop"] = {
            "pts_src": make_voxel(np.asarray(corner_points)),
            "width": self.width,
            "height": self.height,
            "in meters": self.in_meters,
        }
        self.current_image = np.asarray(
            extract_quadrilateral_ROI(self.current_image, **self.config["crop"])
        )

    def bulge_correction(self, left=0, right=0, top=0, bottom=0) -> None:
        """Set the bulge step from per-side pixel displacements."""
        hb, hco, vb, vco = self.compute_bulge(
            left=left, right=right, top=top, bottom=bottom
        )
        self.config["bulge"] = {
            "horizontal_bulge": hb,
            "horizontal_center_offset": hco,
            "vertical_bulge": vb,
            "vertical_center_offset": vco,
        }
        self.current_image = np.asarray(
            self.simple_curvature_correction(
                self.current_image, **self.config["bulge"]
            )
        )

    def stretch_correction(self, point_source, point_destination, stretch_center):
        """Set the stretch step from one displaced point + fixed center."""
        hs, hco, vs, vco = self.compute_stretch(
            point_source=point_source,
            point_destination=point_destination,
            stretch_center=stretch_center,
        )
        self.config["stretch"] = {
            "horizontal_stretch": hs,
            "horizontal_center_offset": hco,
            "vertical_stretch": vs,
            "vertical_center_offset": vco,
        }
        self.current_image = np.asarray(
            self.simple_curvature_correction(
                self.current_image, **self.config["stretch"]
            )
        )

    def compute_bulge(self, img: Optional[np.ndarray] = None, **kwargs):
        """Bulge parameters from max per-side pixel displacements."""
        left = kwargs.get("left", 0)
        right = kwargs.get("right", 0)
        top = kwargs.get("top", 0)
        bottom = kwargs.get("bottom", 0)
        Ny, Nx = (self.current_image if img is None else img).shape[:2]

        if (left + right == 0) and (top + bottom == 0):
            center = [round(Nx / 2), round(Ny / 2)]
        elif left + right == 0:
            center = [round(Nx / 2), round(Ny * top / (top + bottom))]
        elif top + bottom == 0:
            center = [round(Nx * left / (left + right)), round(Ny / 2)]
        else:
            center = [
                round(Nx * left / (left + right)),
                round(Ny * top / (top + bottom)),
            ]
        hco = center[0] - round(Nx / 2)
        vco = center[1] - round(Ny / 2)
        hb = left / ((left - center[0]) * center[1] * (Ny - center[1]))
        vb = top / ((top - center[1]) * center[0] * (Nx - center[0]))
        return hb, hco, vb, vco

    def compute_stretch(self, img: Optional[np.ndarray] = None, **kwargs):
        """Stretch parameters from a (source -> destination) point pair."""
        Ny, Nx = (self.current_image if img is None else img).shape[:2]
        pt_src = kwargs.get("point_source", [Ny, Nx])
        pt_dst = kwargs.get("point_destination", [Ny, Nx])
        center = kwargs.get("stretch_center", [round(Ny / 2), round(Nx / 2)])

        hco = center[0] - round(Nx / 2)
        vco = center[1] - round(Ny / 2)

        if (pt_dst[0] - pt_src[0]) == 0 or not (
            round(0.05 * Nx) <= abs(pt_src[0] - center[0])
            and round(0.05 * Nx) <= pt_src[0] <= Nx - round(0.05 * Nx)
        ):
            hs = 0.0
            if (pt_dst[0] - pt_src[0]) != 0:
                warn("point_source unsuitable for horizontal stretch; set to 0.")
        else:
            hs = -(pt_dst[0] - pt_src[0]) / (
                (pt_src[0] - center[0]) * pt_src[0] * (Nx - pt_src[0])
            )

        if (pt_dst[1] - pt_src[1]) == 0 or not (
            round(0.05 * Ny) <= abs(pt_src[1] - center[1])
            and round(0.05 * Ny) <= pt_src[1] <= Ny - round(0.05 * Ny)
        ):
            vs = 0.0
            if (pt_dst[1] - pt_src[1]) != 0:
                warn("point_source unsuitable for vertical stretch; set to 0.")
        else:
            vs = -(pt_dst[1] - pt_src[1]) / (
                (pt_src[1] - center[1]) * pt_src[1] * (Ny - pt_src[1])
            )
        return hs, hco, vs, vco

    # ------------------------------------------------------ transformation

    @staticmethod
    def _transform_coordinates(X: jnp.ndarray, Y: jnp.ndarray, **kwargs):
        """Bulge/stretch pull-back map applied to coordinate images."""
        hb = kwargs.get("horizontal_bulge", 0.0)
        hs = kwargs.get("horizontal_stretch", 0.0)
        hco = kwargs.get("horizontal_center_offset", 0)
        vb = kwargs.get("vertical_bulge", 0.0)
        vs = kwargs.get("vertical_stretch", 0.0)
        vco = kwargs.get("vertical_center_offset", 0)

        Ny, Nx = X.shape[:2]
        cx = round(Nx / 2) + hco
        cy = round(Ny / 2) + vco
        Xl = X - cx
        Yl = Y - cy
        ymax, ymin = jnp.max(Yl), jnp.min(Yl)
        xmax, xmin = jnp.max(Xl), jnp.min(Xl)
        Xmod = Xl + hb * Xl * (ymax - Yl) * (Yl - ymin) + hs * Xl * (xmax - Xl) * (
            Xl - xmin
        )
        Ymod = Yl + vb * Yl * (xmax - Xl) * (Xl - xmin) + vs * Yl * (ymax - Yl) * (
            Yl - ymin
        )
        return Xmod + cx, Ymod + cy

    def simple_curvature_correction(self, img, **kwargs):
        """Apply one bulge/stretch step directly to an array (tuning path)."""
        img = jnp.asarray(img)
        Ny, Nx = img.shape[:2]
        X, Y = jnp.meshgrid(
            jnp.arange(Nx, dtype=jnp.float32),
            jnp.arange(Ny, dtype=jnp.float32),
        )
        Xm, Ym = self._transform_coordinates(X, Y, **kwargs)
        coords = jnp.stack([Ym, Xm], axis=0)
        dtype = img.dtype
        from ...ops.warp import warp_backend

        out = warp_backend(
            img.astype(jnp.float32), coords, order=self.interpolation_order
        )
        if jnp.issubdtype(dtype, jnp.integer):
            out = jnp.round(out)
        return out.astype(dtype)

    def _precompute_transformed_coordinates(self, shape: tuple[int, int]) -> None:
        """Push identity coordinate images through all configured steps."""
        Ny, Nx = shape
        X, Y = jnp.meshgrid(
            jnp.arange(Nx, dtype=jnp.float32),
            jnp.arange(Ny, dtype=jnp.float32),
        )
        coords = {"X": X, "Y": Y}
        for key in coords:
            pixels = coords[key]
            if "init" in self.config:
                pixels = self.simple_curvature_correction(
                    pixels, **self.config["init"]
                )
            if "crop" in self.config:
                pixels = extract_quadrilateral_ROI(pixels, **self.config["crop"])
            if "bulge" in self.config:
                pixels = self.simple_curvature_correction(
                    pixels, **self.config["bulge"]
                )
            if "stretch" in self.config:
                pixels = self.simple_curvature_correction(
                    pixels, **self.config["stretch"]
                )
            coords[key] = pixels
        X, Y = coords["X"], coords["Y"]
        # (2, H, W) pull-back grid in (row, col) order.
        grid = jnp.stack([Y, X], axis=0)
        self.cache["grid"] = grid
        self.cache["shape"] = tuple(np.asarray(X.shape[:2]))
        self.cache["input_shape"] = shape
        # Static displacement bound vs the output identity (concrete:
        # depends only on the config) — feeds the Pallas warp backend.
        from ...ops.warp import identity_grid

        disp = float(jnp.max(jnp.abs(grid - identity_grid(grid.shape[1:]))))
        self.cache["max_disp"] = int(np.ceil(disp)) + 1
        # Invalidate any fused chains built on the previous geometry.
        self._fusion_version = getattr(self, "_fusion_version", 0) + 1

    # --------------------------------------------------------------- fusion

    @property
    def fusion_order(self) -> int:
        """Interpolation order for fused chains (fusable only if 1)."""
        return self.interpolation_order

    def pullback_field(self, input_shape: tuple):
        """Static pull-back coordinate field (fusion protocol)."""
        shape = tuple(int(s) for s in input_shape)
        if "grid" not in self.cache or self.cache.get("input_shape") != shape:
            self._precompute_transformed_coordinates(shape)
        return self.cache["grid"], self.correct_metadata()

    # ------------------------------------------------------------ correction

    def correct_array(self, img: jnp.ndarray) -> jnp.ndarray:
        img = jnp.asarray(img)
        shape = tuple(img.shape[:2])
        if (
            "grid" not in self.cache
            or self.cache.get("input_shape") != shape
        ):
            self._precompute_transformed_coordinates(shape)
        grid = self.cache["grid"]
        dtype = img.dtype
        from ...ops.warp import warp_backend

        out = warp_backend(
            img.astype(jnp.float32),
            grid,
            order=self.interpolation_order,
            max_disp=self.cache.get("max_disp"),
        )
        if jnp.issubdtype(dtype, jnp.integer):
            out = jnp.round(out)
        return out.astype(dtype)

    def correct_metadata(self, metadata: Optional[dict] = None) -> dict:
        meta: dict = {}
        if "crop" in self.config:
            crop = self.config["crop"]
            if "width" in crop and "height" in crop:
                meta["dimensions"] = [crop["height"], crop["width"]]
                meta["origin"] = np.array([0.0, crop["height"]])
        return meta

    # ------------------------------------------------------------------- I/O

    def save(self, path) -> None:
        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        cfg = {
            k: ({kk: np.asarray(vv) if isinstance(vv, (jnp.ndarray, np.ndarray)) else vv
                 for kk, vv in v.items()} if isinstance(v, dict) else v)
            for k, v in self.config.items()
        }
        np.savez(path, class_name=type(self).__name__, config=np.array([cfg], dtype=object))

    def load(self, path) -> None:
        path = Path(path)
        if not path.is_file():
            raise FileNotFoundError(f"File {path} not found.")
        data = np.load(path, allow_pickle=True)
        self.config = load_curvature_correction_config_from_dict(
            data["config"][0]
        )
        self.cache = {}

    def return_image(self):
        from ...image.image import Image

        return Image(self.current_image, width=self.width, height=self.height)
