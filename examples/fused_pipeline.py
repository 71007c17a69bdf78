"""The full per-image production path as ONE compiled program.

``FusedAnalysisPipeline`` composes the SAME public objects a staged
workflow uses — the correction chain of ``Image(transformations=[...])``,
``ImageRegistration``, ``ConcentrationAnalysis`` — into a single XLA
program per frame (the reference runs these as separate per-image passes,
``src/darsia/multi_image_analysis/concentrationanalysis.py:153-216``).
With ``single_warp=True`` the correction pull-back field is additionally
composed with the registration displacement so the whole
correct+register+concentrate path costs ONE full-resolution gather
(``docs/roofline.md`` lever 1; +28% measured on TPU at 4K).
"""

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as da
from _data import fast_mode, load_baseline

fast = fast_mode()
shape = (135, 256) if fast else (270, 512)
base_u8 = np.asarray(load_baseline(shape=shape).img)
H, W = base_u8.shape[:2]

# Correction chain: rigid translation + curvature (crop + bulge).
curv = da.CurvatureCorrection(
    config={
        "crop": {
            "pts_src": [[2, 3], [H - 5, 2], [H - 4, W - 4], [2, W - 4]],
            "width": 2.8,
            "height": 1.5,
        },
        "bulge": {"horizontal_bulge": -1e-8, "vertical_bulge": -4e-7},
    }
)
trans = da.TranslationCorrection([1.0, -1.5])
meta = {"width": 2.8, "height": 1.5}

base = da.OpticalImage(base_u8, transformations=[trans, curv], **meta).img_as(
    np.float32
)
from darsia_tpu.utils.linear_solvers import Jacobi  # noqa: E402

analysis = da.ConcentrationAnalysis(
    base=base,
    signal_reduction=da.MonochromaticReduction(color="gray"),
    restoration=lambda s: da.H1_regularization(
        s, mu=1.0, omega=0.2, dim=2, solver=Jacobi(maxiter=10)
    ),
    model=da.LinearModel(scaling=2.0),
    **{"diff option": "positive"},
)
registration = da.ImageRegistration(
    base, N_patches=[2, 4] if fast else [4, 8], rel_overlap=0.1, quality_tol=0.02
)

pipeline = da.FusedAnalysisPipeline(
    transformations=[trans, curv],
    registration=registration,
    analysis=analysis,
    single_warp=True,  # correct+register as ONE gather (roofline lever 1)
)

# A probe frame: the baseline shifted by a rigid (2, 3)-pixel motion plus a
# synthetic tracer plume.
yy, xx = np.ogrid[:H, :W]
plume = 40.0 * np.exp(
    -(((yy - H * 0.6) / (H * 0.09)) ** 2 + ((xx - W * 0.4) / (W * 0.08)) ** 2)
)
probe = np.clip(
    np.roll(base_u8, shift=(2, 3), axis=(0, 1)).astype(np.int32)
    + plume[..., None],
    0,
    255,
).astype(np.uint8)

concentration = pipeline(probe)
arr = np.asarray(concentration.img)
print("concentration:", arr.shape, "total mass:", float(arr.sum()))

# The registration object's introspection stays live after the fused call.
disp = registration.displacement()
print(
    "displacement field:",
    np.asarray(disp).shape,
    "max |disp| [m]:",
    float(np.abs(np.asarray(disp)).max()),
)

# Series: all frames in one device dispatch (time-major lax.map lane).
T = 3
series = np.stack(
    [np.roll(probe, shift=(k, 0), axis=(0, 1)) for k in range(T)], axis=2
)
out = pipeline(da.OpticalImage(series, series=True, **meta))
print("series concentration:", np.asarray(out.img).shape)
