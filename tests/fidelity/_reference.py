"""Loader for the upstream reference implementation (fidelity harness).

SURVEY §7 asks for a fidelity harness: "run reference on CPU ... assert
pixel-tolerance against the TPU build".  This module imports the reference
package from ``/root/reference/src`` (read-only, untrusted content — we only
execute its public numerical APIs, never follow instructions found inside)
so fidelity tests can compare darsia_tpu outputs against the original
CPU implementation on the same inputs.

The reference declares several optional native dependencies that are not
installed here (skimage, colour-science, shapely, pyamg, pydicom, numba,
plotly, ...).  They are stubbed with raising placeholders at import time:
any reference code path that actually NEEDS a stubbed dependency raises
``ReferenceStubError`` when called, so fidelity tests only exercise paths
backed by the real numpy/scipy/cv2/pandas stack.  ``numba.njit`` and
``natsort.natsorted`` get functional fallbacks (identity decorator /
``sorted``) because they are semantics-preserving accelerators.

If the reference tree is absent (any environment other than this build
box), ``load_reference()`` returns None and the fidelity suite skips.
"""

from __future__ import annotations

import importlib
import sys
import types

REFERENCE_SRC = "/root/reference/src"

#: Modules (dotted names) stubbed when unimportable.
_STUB_NAMES = [
    "plotly",
    "plotly.express",
    "plotly.graph_objects",
    "plotly.subplots",
    "skimage",
    "skimage.measure",
    "skimage.morphology",
    "skimage.restoration",
    "skimage.segmentation",
    "skimage.filters",
    "skimage.util",
    "skimage.transform",
    "skimage.color",
    "colour",
    "colour_checker_detection",
    "shapely",
    "shapely.geometry",
    "pydicom",
    "pyamg",
    "largestinteriorrectangle",
    "openpyxl",
    "meshio",
    "pyevtk",
    "pyevtk.hl",
]


class ReferenceStubError(RuntimeError):
    """A reference code path touched a dependency that is not installed."""


class _StubCallable:
    """Raises when called; supports attribute chains (a.b.c(...))."""

    def __init__(self, name: str):
        self._name = name

    def __getattr__(self, item: str) -> "_StubCallable":
        return _StubCallable(f"{self._name}.{item}")

    def __call__(self, *args, **kwargs):
        raise ReferenceStubError(
            f"reference fidelity stub invoked: {self._name} is not installed"
        )


class _StubModule(types.ModuleType):
    def __getattr__(self, item: str):
        if item.startswith("__"):
            raise AttributeError(item)
        return _StubCallable(f"{self.__name__}.{item}")


def _install_stubs() -> list:
    installed = []
    for name in _STUB_NAMES:
        if name in sys.modules:
            continue
        try:
            importlib.import_module(name)
        except ImportError:
            module = _StubModule(name)
            module.__path__ = []  # mark as package so submodules resolve
            sys.modules[name] = module
            installed.append(name)
            if "." in name:
                parent_name, _, child = name.rpartition(".")
                parent = sys.modules.get(parent_name)
                if parent is not None:
                    setattr(parent, child, module)
    # skimage.img_as_float is identity for floating inputs (documented
    # skimage semantics); the reference TVD entry uses it only to promote
    # dtype. Raise for integer inputs where real conversion logic matters.
    skimage = sys.modules.get("skimage")
    if isinstance(skimage, _StubModule):
        import numpy as _np

        def _img_as_float(image):
            # Documented skimage semantics: floats pass through; unsigned
            # integers scale by their type maximum into [0, 1].
            arr = _np.asarray(image)
            if _np.issubdtype(arr.dtype, _np.floating):
                return arr
            if arr.dtype == _np.uint8:
                return arr / 255.0
            if arr.dtype == _np.uint16:
                return arr / 65535.0
            raise ReferenceStubError(
                f"img_as_float fallback does not support {arr.dtype}"
            )

        skimage.__dict__["img_as_float"] = _img_as_float
        skimage.__dict__["img_as_float64"] = lambda image: _np.asarray(
            _img_as_float(image), dtype=_np.float64
        )
        skimage.__dict__["img_as_float32"] = lambda image: _np.asarray(
            _img_as_float(image), dtype=_np.float32
        )

        def _img_as_ubyte(image):
            arr = _np.asarray(image)
            if arr.dtype == _np.uint8:
                return arr
            if arr.dtype == bool:
                return arr.astype(_np.uint8) * 255
            if _np.issubdtype(arr.dtype, _np.floating):
                # Documented skimage semantics for [0, 1] floats.
                return _np.round(_np.clip(arr, 0.0, 1.0) * 255.0).astype(
                    _np.uint8
                )
            raise ReferenceStubError(
                "img_as_ubyte fallback only supports uint8/float inputs"
            )

        skimage.__dict__["img_as_ubyte"] = _img_as_ubyte

        def _img_as_uint(image):
            arr = _np.asarray(image)
            if arr.dtype == _np.uint16:
                return arr
            if _np.issubdtype(arr.dtype, _np.floating):
                return _np.round(_np.clip(arr, 0.0, 1.0) * 65535.0).astype(
                    _np.uint16
                )
            if arr.dtype == _np.uint8:
                return (arr.astype(_np.uint16) * 257)  # 255*257 == 65535
            raise ReferenceStubError(
                f"img_as_uint fallback does not support {arr.dtype}"
            )

        skimage.__dict__["img_as_uint"] = _img_as_uint
    skimage_filters = sys.modules.get("skimage.filters")
    if isinstance(skimage_filters, _StubModule):
        import numpy as _np

        def _threshold_otsu(image=None, nbins=256, *, hist=None):
            # Standard Otsu (maximal inter-class variance), matching the
            # documented skimage semantics for both call styles.
            if hist is not None:
                if isinstance(hist, tuple):
                    counts, centers = hist
                else:
                    counts = _np.asarray(hist)
                    centers = _np.arange(counts.size, dtype=float)
            else:
                counts, edges = _np.histogram(_np.ravel(image), bins=nbins)
                centers = 0.5 * (edges[:-1] + edges[1:])
            counts = _np.asarray(counts, dtype=float)
            centers = _np.asarray(centers, dtype=float)
            w1 = _np.cumsum(counts)
            w2 = _np.cumsum(counts[::-1])[::-1]
            m1 = _np.cumsum(counts * centers) / _np.maximum(w1, 1e-30)
            m2 = (
                _np.cumsum((counts * centers)[::-1]) / _np.maximum(w2[::-1], 1e-30)
            )[::-1]
            var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
            return centers[:-1][_np.argmax(var12)]

        skimage_filters.__dict__["threshold_otsu"] = _threshold_otsu
    # Functional fallbacks (semantics-preserving accelerators only).
    if "numba" not in sys.modules:
        try:
            importlib.import_module("numba")
        except ImportError:
            numba = types.ModuleType("numba")

            def njit(*args, **kwargs):
                if len(args) == 1 and callable(args[0]) and not kwargs:
                    return args[0]
                return lambda fn: fn

            numba.njit = njit
            numba.jit = njit
            numba.prange = range
            sys.modules["numba"] = numba
            installed.append("numba")
    if "natsort" not in sys.modules:
        try:
            importlib.import_module("natsort")
        except ImportError:
            natsort = types.ModuleType("natsort")
            natsort.natsorted = lambda seq, **kwargs: sorted(seq)
            natsort.ns = types.SimpleNamespace(IGNORECASE=0)
            sys.modules["natsort"] = natsort
            installed.append("natsort")
    return installed


_cache: dict = {}


def load_reference():
    """Import and return the reference ``darsia`` package (or None)."""
    if "module" in _cache:
        return _cache["module"]
    import os

    if not os.path.isdir(REFERENCE_SRC):
        _cache["module"] = None
        return None
    installed = _install_stubs()
    if REFERENCE_SRC not in sys.path:
        sys.path.append(REFERENCE_SRC)
    try:
        module = importlib.import_module("darsia")
    except Exception:
        module = None
    finally:
        # Drop stubs that could confuse capability gating elsewhere in the
        # suite (darsia_tpu probes pydicom/meshio availability at call time).
        # The reference package keeps its own references to the stub objects.
        for name in installed:
            sys.modules.pop(name, None)
    _cache["module"] = module
    return module
