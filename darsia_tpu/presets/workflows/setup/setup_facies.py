"""Facies setup: labels -> facies via config mapping + property checks.

Parity: reference ``presets/workflows/setup/setup_facies.py:17-90``.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from ....image.imread import imread
from ....utils.segmentation import reassign_labels
from ..config.fluidflower_config import FluidFlowerConfig
from .illustrations import save_discrete_map_illustration

logger = logging.getLogger(__name__)

__all__ = ["setup_facies"]


def setup_facies(cls=None, path=None, show: bool = False):
    if path is None:
        path = cls  # allow setup_facies(path)
    config = FluidFlowerConfig(path, require_data=False, require_results=False)
    config.check("facies", "labeling")
    labels = imread(config.labeling.labels)
    mapping = dict(config.facies.label_to_facies_map)
    for label_id in np.unique(np.asarray(labels.img)):
        mapping.setdefault(int(label_id), int(label_id))
    facies = reassign_labels(labels, mapping)

    import pandas as pd

    props_path = Path(config.facies.props)
    if props_path.suffix == ".xlsx":
        props = pd.read_excel(props_path)
    else:
        props = pd.read_csv(props_path)
    facies_ids = set(props["id"].astype(int).tolist())
    for facies_id in np.unique(np.asarray(facies.img)):
        if int(facies_id) not in facies_ids:
            raise ValueError(
                f"Facies id {facies_id} not found in facies properties."
            )
    facies_path = Path(config.facies.path)
    facies_path.parent.mkdir(parents=True, exist_ok=True)
    facies.save(facies_path)
    save_discrete_map_illustration(
        facies.img, facies_path.with_suffix(".jpg"), title="Facies"
    )
    return facies
