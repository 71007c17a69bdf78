"""Color paths, ranges, spectra and embeddings (parity: reference
``signals/color/``)."""

from .color_mode import ColorMode
from .color_path import ColorPath, define_color_path
from .color_range import (
    ColorRange,
    DiscreteColorRange,
    ColorSpectrum,
    color_to_index,
    index_to_color,
    flatten_index,
    unflatten_index,
)
from .label_maps import LabelColorMap, LabelColorPathMap, LabelColorSpectrumMap
from .utils import get_mean_color
from .color_embedding import (
    ColorEmbeddingBasis,
    parse_color_embedding_basis,
    calibration_basis_folder,
    ColorEmbeddingRuntime,
    ColorEmbeddingTransform,
    ColorEmbedding,
    ColorChannelEmbedding,
    ColorChannelEmbeddingTransform,
    ColorPathEmbedding,
    ColorPathEmbeddingTransform,
    ColorRangeEmbedding,
    ColorRangeEmbeddingTransform,
    to_scalar_image,
    channel_index,
    normalized_trichromatic,
)
from .color_path_regression import LabelColorPathMapRegression
