"""Mixed-dimensional data: embed 1d data into 2d and superpose.

Mirrors reference examples/vtu_images.py: read a 2d vtu image and a 1d
(fracture) vtu image, reconstruct equi-dimensionally, and superpose both
weighted by porosity.  VTU ingest (``darsia.imread`` on .vtu via meshio)
is capability-gated; without meshio or sample files the same
weight/superpose arithmetic is exercised on synthesized fields.
"""

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as darsia
from _data import images_folder

folder = images_folder()

try:
    import meshio  # noqa: F401

    HAVE_MESHIO = True
except ImportError:
    HAVE_MESHIO = False

if (
    HAVE_MESHIO
    and folder is not None
    and (folder / "fracture_flow_2.vtu").exists()
):
    vtu_image_2d = darsia.imread(
        folder / "fracture_flow_2.vtu", key="c", shape=(200, 200), vtu_dim=2
    )
    fracture_aperture = 0.1 * 0.01  # in m
    vtu_image_1d = darsia.imread(
        folder / "fracture_flow_1.vtu",
        key="c",
        shape=(1001, 51),
        vtu_dim=1,
        width=fracture_aperture,
    )
else:
    # Synthetic stand-ins: a smooth 2d concentration field and a narrow
    # "fracture" strip embedded on the same physical domain.
    yy, xx = np.meshgrid(
        np.linspace(0, 1, 200), np.linspace(0, 1, 200), indexing="ij"
    )
    matrix_c = np.exp(-10 * ((xx - 0.4) ** 2 + (yy - 0.5) ** 2))
    vtu_image_2d = darsia.ScalarImage(matrix_c, width=1.0, height=1.0)
    fracture_c = np.zeros_like(matrix_c)
    fracture_c[:, 98:102] = 1.0
    vtu_image_1d = darsia.ScalarImage(fracture_c, width=1.0, height=1.0)

# Equi-dimensional reconstruction: porosity-weighted superposition.
porosity_2d = 0.211
porosity_1d = 1.0
vtu_image = darsia.superpose(
    [
        darsia.weight(vtu_image_2d, porosity_2d),
        darsia.weight(vtu_image_1d, porosity_1d),
    ]
)
print("superposed shape:", vtu_image.shape)

# Integrate the combined concentration over the domain.
geometry = darsia.Geometry(**vtu_image.shape_metadata())
print("integrated mass:", float(geometry.integrate(vtu_image)))
assert np.isfinite(float(geometry.integrate(vtu_image)))
