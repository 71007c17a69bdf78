"""CO2 phase segmentation with the FluidFlower benchmark preset.

Mirrors reference examples/co2_analysis.py.
"""

import json
import tempfile
from pathlib import Path

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as da
from _data import load_baseline, load_co2_series

work = Path(tempfile.mkdtemp(prefix="co2_example_"))
baseline = load_baseline(shape=(180, 340))
images = load_co2_series(shape=(180, 340))
baseline.save(work / "baseline.npz")
for i, img in enumerate(images):
    img.save(work / f"co2_{i}.npz")

common = {
    "diff option": "absolute",
    "restoration -> model": True,
    "restoration resize": 0.5,
    "restoration method": "chambolle",
    "restoration weight": 0.02,
    "restoration max_num_iter": 50,
    "prior remove small objects size": 20,
    "prior fill holes size": 20,
    "prior resize": 0.5,
    "prior method": "chambolle",
    "prior weight": 0.02,
    "prior max_num_iter": 50,
    "posterior criterion": "value",
    "posterior threshold": 0.02,
}
config = {
    "physical_asset": {"dimensions": {"width": 2.8, "height": 1.5}},
    "co2": dict(common, **{
        "color": "negative-key",
        "prior threshold value": 0.12,
        "cleaning_filter": str(work / "cache" / "c1.npy"),
    }),
    "co2(g)": dict(common, **{
        "color": "blue",
        "prior threshold value": 0.12,
        "cleaning_filter": str(work / "cache" / "c2.npy"),
    }),
}
config_path = work / "config.json"
config_path.write_text(json.dumps(config))

analysis = da.FluidFlowerCO2Analysis(
    baseline=work / "baseline.npz",
    config=config_path,
    results=work / "results",
)
for i in range(3):
    co2, co2_gas = analysis.single_image_analysis(
        work / f"co2_{i}.npz", write_contours_to_file=True
    )
    c = np.asarray(co2.img).astype(bool)
    g = np.asarray(co2_gas.img).astype(bool)
    print(
        f"co2_{i}: co2 {c.mean():.3f} of domain, gas {g.mean():.3f}, "
        f"gas within co2: {(~c & g).sum() == 0}"
    )
print("contour plots in", work / "results" / "contour_plots")
