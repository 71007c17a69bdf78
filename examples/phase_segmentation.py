"""CO2 phase segmentation on a FluidFlower rig (BASELINE validation config).

Mirrors reference examples/phase_segmentation.py: a rig subclass tags
water / ESF / C-sand layers from the watershed segmentation, CO2(g) is
excluded from the ESF layer via expert knowledge, and the standardized
batch analysis runs over the image series.  The reference xfails without
its (unshared) Zenodo images; here the same pipeline runs on the bundled
example imagery (or the synthetic fallback) so the workflow executes
end-to-end.
"""

import json
import tempfile
from pathlib import Path

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as darsia
from _data import load_baseline, load_co2_series


class LargeRigCO2Analysis(darsia.FluidFlowerCO2Analysis):
    """CO2 analysis on a rig with named geological layers + ESF expert
    knowledge (ref phase_segmentation.py:26-160, flattened to a single
    inheritance chain — the layer segmentation runs as a post-init step)."""

    def __init__(self, baseline, config, results, update_setup=False):
        super().__init__(baseline, config, results, update_setup)
        self._segment_geometry(update_setup=update_setup)

    def _segment_geometry(self, update_setup: bool = False) -> None:
        seg = self.config["segmentation"]
        labels_path = Path(seg["labels_path"])
        if labels_path.exists() and not update_setup:
            self.labels = np.load(labels_path)
        else:
            labels = darsia.segment(
                np.asarray(self.base.img),
                markers_method="supervised",
                edges_method="scharr",
                marker_points=seg["marker_points"],
            )
            self.labels = np.asarray(
                labels.img if hasattr(labels, "img") else labels
            )
            labels_path.parent.mkdir(parents=True, exist_ok=True)
            np.save(labels_path, self.labels)
        self.water = self._labels_to_mask(seg.get("water", []))
        self.esf_sand = self._labels_to_mask(seg.get("esf", []))
        self.c_sand = self._labels_to_mask(seg.get("c", []))

    def _labels_to_mask(self, ids) -> np.ndarray:
        ids = ids if isinstance(ids, list) else [ids]
        mask = np.zeros(np.asarray(self.labels).shape[:2], dtype=bool)
        for i in ids:
            mask[self.labels == i] = True
        return mask

    def _expert_knowledge_co2_gas(self, co2) -> np.ndarray:
        return np.logical_and(
            np.asarray(co2.img, dtype=bool), np.logical_not(self.esf_sand)
        )


work = Path(tempfile.mkdtemp(prefix="phase_segmentation_"))
baseline = load_baseline(shape=(180, 340))
images = load_co2_series(shape=(180, 340))
baseline.save(work / "baseline.npz")
paths = []
for i, img in enumerate(images):
    img.save(work / f"co2_{i}.npz")
    paths.append(work / f"co2_{i}.npz")

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
    "segmentation": {
        "labels_path": str(work / "cache" / "labels.npy"),
        "marker_points": [[45, 170], [135, 170]],
        "water": [1],
        "esf": [1],
        "c": [2],
    },
    "co2": dict(
        common,
        **{
            "color": "negative-key",
            "prior threshold value": 0.12,
            "cleaning_filter": str(work / "cache" / "c1.npy"),
        },
    ),
    "co2(g)": dict(
        common,
        **{
            "color": "blue",
            "prior threshold value": 0.12,
            "cleaning_filter": str(work / "cache" / "c2.npy"),
        },
    ),
}
config_path = work / "config.json"
config_path.write_text(json.dumps(config))

analysis = LargeRigCO2Analysis(
    baseline=work / "baseline.npz", config=config_path, results=work / "results"
)
print("layers: water", analysis.water.mean(), "esf", analysis.esf_sand.mean())

# Standardized CO2 batch analysis with contours written to file.
analysis.batch_analysis(paths, plot_contours=False, write_contours_to_file=True)
for i, path in enumerate(paths):
    co2, co2_gas = analysis.single_image_analysis(path)
    c = np.asarray(co2.img, dtype=bool)
    g = np.asarray(co2_gas.img, dtype=bool)
    in_esf = np.logical_and(g, analysis.esf_sand).sum()
    print(f"co2_{i}: co2 {c.mean():.3f}, gas {g.mean():.3f}, gas in esf: {in_esf}")
    assert in_esf == 0, "expert knowledge must exclude CO2(g) from ESF"
print("results in", work / "results")
