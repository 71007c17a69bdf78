"""FluidFlower workflow layer (parity: reference ``presets/workflows/``)."""

from .facies_props import FaciesProps
from .mode_resolution import (
    LEGACY_COLOR_TO_MASS_MODES,
    SCALAR_PRODUCT_MODES,
    ColorEmbeddingMode,
    parse_color_mode,
    validate_mode_syntax,
    mode_requires_color_to_mass,
    resolve_mode_image,
)
from .rig import Rig
from .simple_run_analysis import SimpleRunAnalysis
from .heterogeneous_color_analysis import HeterogeneousColorAnalysis
from .heterogeneous_color_to_mass_analysis import HeterogeneousColorToMassAnalysis
from .analysis.expert_knowledge import ExpertKnowledgeAdapter
from .segmentation_contours import (
    SimpleSegmentation,
    GradientBasedSegmentation,
    SegmentationContours,
)
from . import analysis, calibration, comparison, helper, setup, utils
from .restoration import RestorationMaskFactory, build_restoration
from .mass_computation import MassComputation
from .basis import label_ids_from_image
from .utils.roi_visualization import (
    ActiveRegionRenderData,
    build_active_mask_from_rois,
    render_active_region,
    draw_active_region,
)
