"""Workflow analysis steps (parity: reference
``presets/workflows/analysis/``)."""

from .expert_knowledge import ExpertKnowledgeAdapter
from .progress import (
    AnalysisProgressEvent,
    publish_analysis_progress,
    publish_step_start,
    publish_image_progress,
    publish_step_complete,
    normalize_progress_event,
)
from .streaming import (
    encode_low_resolution_png,
    publish_preview,
    publish_stream_images,
)
from .scalar_products import (
    RescaledMassProducts,
    compute_rescaled_mass_products,
    analysis_scalar_products,
    requires_rescaled_modes,
)
from .image_export_formats import ImageExportFormats
from .analysis_context import (
    AnalysisContext,
    select_image_paths,
    build_restoration,
    prepare_analysis_context,
)
from .analysis_mass import analysis_mass_from_context, run_mass_analysis
from .analysis_cropping import analysis_cropping_from_context, analysis_cropping
from .analysis_volume import analysis_volume_from_context, analysis_volume
from .analysis_segmentation import (
    analysis_segmentation_from_context,
    analysis_segmentation,
)
from .analysis_fingers import analysis_fingers_from_context, analysis_fingers
from .analysis_thresholding import (
    analysis_thresholding_from_context,
    analysis_thresholding,
)
