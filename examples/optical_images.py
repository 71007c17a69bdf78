"""DarSIA for photographs: curvature correction + color-space conversions.

Mirrors reference examples/optical_images.py (curvature correction from a
config file, grid overlay to visualize the warp, trichromatic /
monochromatic conversions, dtype probes).
"""

import json

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as darsia
from _data import images_folder

folder = images_folder()
if folder is not None and (folder / "config.json").exists():
    path = folder / "co2_2.jpg"
    with open(folder / "config.json") as openfile:
        config = json.load(openfile)
    curvature_correction = darsia.CurvatureCorrection(config=config["curvature"])
    corrected_image = darsia.imread(
        path=path, transformations=[curvature_correction], width=2.8, height=1.5
    )
    original_image = darsia.imread(path, width=2.8, height=1.5)
else:  # Synthetic fallback: bulge-only correction on a generated image.
    from _data import load_baseline

    original_image = load_baseline(shape=(270, 512)).to_optical()
    curvature_correction = darsia.CurvatureCorrection(
        config={"bulge": {"vertical_bulge": -1e-7}}
    )
    corrected_image = darsia.OpticalImage(
        img=np.asarray(original_image.img),
        transformations=[curvature_correction],
        width=2.8,
        height=1.5,
    )

print("corrected image shape:", corrected_image.shape)

# Demonstrate the effect of the correction on a grid overlay.
original_with_grid = original_image.add_grid(origin=[0.0, 0.0], dx=0.1, dy=0.1)
corrected_with_grid = darsia.OpticalImage(
    img=np.asarray(original_with_grid.img),
    transformations=[curvature_correction],
    width=2.8,
    height=1.5,
    color_space="RGB",
)
print("grid-corrected shape:", corrected_with_grid.shape)

# Color-space conversions.
hsv_image = corrected_image.to_trichromatic("hsv", return_image=True)
print("hsv range:", float(np.min(hsv_image.img)), float(np.max(hsv_image.img)))

bgr_image = corrected_image.copy()
bgr_image.to_trichromatic("bgr")
print("bgr color space:", bgr_image.color_space)

red_image = corrected_image.to_monochromatic("red")
print("red channel shape:", red_image.shape, "scalar:", red_image.scalar)

gray_image = corrected_image.to_monochromatic("gray")
print("gray dtype:", np.asarray(gray_image.img).dtype)
