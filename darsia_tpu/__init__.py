"""darsia_tpu — TPU-native Darcy-scale image analysis.

A ground-up JAX/XLA/Pallas rebuild of the DarSIA capability set
(physical-coordinate images, geometric & color corrections, TV restoration,
signal models, image registration, finite-volume optimal transport) designed
for TPU hardware: fused warp+color XLA programs, matrix-free stencil solvers,
`shard_map` spatial parallelism over device meshes.

The public namespace is flat (``darsia_tpu.imread``, ``darsia_tpu.Image``,
...) mirroring the reference API so users can switch with an import change.
"""

from __future__ import annotations

__version__ = "0.1.0"

# ---- L0: utils / geometry
from .utils.point import (
    BasePoint,
    Coordinate,
    CoordinateArray,
    Voxel,
    VoxelArray,
    VoxelCenter,
    VoxelCenterArray,
    make_coordinate,
    make_voxel,
    make_voxel_center,
    to_coordinate,
    to_voxel,
    to_voxel_center,
)
from .utils.box import bounding_box, bounding_box_inverse, perimeter, random_patches
from .utils.dtype import convert_dtype
from .utils.formats import Format

# ---- L1: image core
from .image.indexing import (
    interpret_indexing,
    to_matrix_indexing,
    to_cartesian_indexing,
    matrixToCartesianIndexing,
    cartesianToMatrixIndexing,
)
from .image.coordinatesystem import (
    CoordinateSystem,
    voxels_to_coordinates,
    coordinates_to_voxels,
    check_equal_coordinatesystems,
)
from .image.arithmetics import weight, superpose, stack, zeros_like, ones_like
from .image.roi import ROI
from .image.subregions import InterpolationOption
from .image.coordinatetransformation import CoordinateTransformation
from .image.image import Image, ScalarImage, OpticalImage, ExtensiveImage
from .image.imread import (
    imread,
    imread_from_bytes,
    imread_from_numpy,
    imread_from_npz,
    imread_from_optical,
    imread_from_dicom,
    imread_from_vtu,
)

# ---- L4: signals
from .signals.reduction.dimensionreduction import (
    AxisReduction,
    reduce_axis,
    extrude_along_axis,
)
from .signals.reduction.signalreduction import SignalReduction, MonochromaticReduction
from .signals.models.basemodel import Model, HeterogeneousModel
from .signals.models.linearmodel import (
    ScalingModel,
    LinearModel,
    HeterogeneousLinearModel,
)
from .signals.models.clipmodel import ClipModel
from .signals.models.staticthresholdmodel import StaticThresholdModel
from .signals.models.dynamicthresholdmodel import (
    HistogrammBasedThresholding,
    StandardOtsu,
    TwoPeakHistogrammAnalysis,
    GlobalMinTwoPeakHistogrammAnalysis,
    OtsuTwoPeakHistogrammAnalysis,
    DynamicThresholdModel,
    otsu_threshold,
)
from .signals.models.kernelinterpolation import (
    KernelInterpolation,
    AdvancedKernelInterpolation,
)
from .signals.models.combinedmodel import CombinedModel
from .signals.models.binarydataselector import (
    BaseCriterion,
    ValueCriterion,
    RelativeValueCriterion,
    TransformedValueCriterion,
    GradientModulusCriterion,
    CombinedCriterion,
    BinaryDataSelector,
)
from .utils.kernels import BaseKernel, LinearKernel, GaussianKernel
from .signals.color import (
    ColorMode,
    ColorPath,
    define_color_path,
    ColorRange,
    DiscreteColorRange,
    ColorSpectrum,
    color_to_index,
    index_to_color,
    flatten_index,
    unflatten_index,
    LabelColorMap,
    LabelColorPathMap,
    LabelColorSpectrumMap,
    get_mean_color,
    ColorEmbeddingBasis,
    parse_color_embedding_basis,
    calibration_basis_folder,
    ColorEmbeddingRuntime,
    ColorEmbeddingTransform,
    ColorEmbedding,
    ColorChannelEmbedding,
    ColorPathEmbedding,
    ColorRangeEmbedding,
    channel_index,
    normalized_trichromatic,
    LabelColorPathMapRegression,
)
from .signals.models.color_path_interpolation import (
    ColorPathFunction,
    ColorPathInterpolation,
    LabelColorPathInterpolation,
)

# ---- L5: analysis engines
from .analysis.concentrationanalysis import (
    ConcentrationAnalysis,
    PriorPosteriorConcentrationAnalysis,
)
from .analysis.translationanalysis import TranslationAnalysis
from .analysis.imageregistration import (
    DiffeomorphicImageRegistration,
    MultiscaleDiffeomorphicImageRegistration,
    ImageRegistration,
)
from .analysis.fusedpipeline import FusedAnalysisPipeline
from .image.patches import Patches
from .corrections.shape.piecewiseperspective import PiecewisePerspectiveTransform
from .corrections.shape.deformation import DeformationCorrection
from .analysis.contouranalysis import (
    contour_length,
    extract_lower_arc,
    ContourAnalysis,
)
from .analysis.contour_smoother import (
    Contour,
    ContourSmoother,
    ContourSmootherSequence,
    PolyDPSmoother,
    MovingAverageSmoother,
    GaussianSmoother,
    SavitzkyGolaySmoother,
)
from .analysis.skeleton_analysis import (
    SkeletonAnalysis,
    PathEvolutionAnalysis,
    PathUnit,
)
from .analysis.model_calibration import (
    AbstractModelObjective,
    InjectionRateModelObjectiveMixin,
    AbsoluteVolumeModelObjectiveMixin,
)
from .analysis.balancing_calibration import (
    AbstractBalancingCalibration,
    ContinuityBasedBalancingCalibrationMixin,
)
from .analysis.segmentationcomparison import SegmentationComparison

# ---- L7: experiment / multiphase / managers
from .experiment.protocols import (
    ImagingInterval,
    ImagingProtocol,
    InjectionProtocol,
    ThermodynamicState,
    PressureTemperatureProtocol,
)
from .experiment.experiment import Experiment, TimeWindow, ProtocolledExperiment
from .multiphase.flash import Flash, AdvancedFlash, SimpleFlash
from .multiphase.calibration import (
    TransformationCalibrationSession,
    calibrate_transformations,
)
from .multiphase.mass_analysis import (
    EPSILON,
    co2_gas_density,
    co2_solubility,
    water_density,
    CO2MassAnalysis,
    AdvancedCO2MassAnalysis,
    MassAnalysisResults,
    SimpleMassAnalysisResults,
    ThresholdAnalysisResults,
    full_like,
)
from .multiphase.time_series import (
    TimeSeriesData,
    MultiphaseTimeSeriesData,
    MultiphaseTimeSeriesAnalysis,
)
from .manager.analysisbase import AnalysisBase
from .manager.concentrationanalysisbase import ConcentrationAnalysisBase
from .manager.traceranalysis import TracerAnalysis
from .manager.co2analysis import CO2Analysis

# ---- L2: corrections
from .corrections import (
    AnyCorrection,
    BaseCorrection,
    TypeCorrection,
    read_correction,
    extract_quadrilateral_ROI,
    homography_from_points,
    quad_coordinate_grid,
    CurvatureCorrection,
    BaseTransformation,
    TransformationCorrection,
    AffineTransformation,
    AffineCorrection,
    RotationCorrection,
    TranslationEstimator,
    TranslationCorrection,
    DriftCorrection,
    GeneralizedPerspectiveTransformation,
    GeneralizedPerspectiveCorrection,
    CORRECTION_REGISTRY,
    BaseBalance,
    ColorBalance,
    WhiteBalance,
    AffineBalance,
    AdaptiveBalance,
    color_balance,
    white_balance,
    affine_balance,
    ColorChecker,
    ColorCheckerAfter2014,
    CustomColorChecker,
    ColorCorrection,
    IlluminationCorrection,
    PatchwiseIlluminationCorrection,
    DynamicIlluminationCorrection,
    RelativeColorCorrection,
    EOTF,
    ExperimentalColorCorrection,
)

# ---- L3: restoration & solvers
from .restoration.resize import Resize, resize, equalize_voxel_size, uniform_refinement
from .restoration.tvd import TVD, tvd
from .restoration.split_bregman_tvd import split_bregman_tvd
from .restoration.h1_regularization import H1_regularization
from .restoration.median import Median, median_filter
from .restoration.binaryinpaint import (
    BinaryRemoveSmallObjects,
    BinaryFillHoles,
    BinaryLocalConvexCover,
)
from .restoration.averaging import REV, VolumeAveraging, volume_average
from .utils.linear_solvers import Solver, Jacobi, CG, MG
from .utils import quadrature
from .utils.derivatives import backward_diff, forward_diff, fv_laplace, laplace
from .utils.andersonacceleration import AndersonAcceleration
from .utils import morphology

# ---- utils (analysis helpers)
from .utils.kmeans import kmeans
from .utils.masks import Masks
from .utils.slices import (
    add_slices,
    add_slice_pairs,
    subtract_slices,
    subtract_slice_pairs,
    array_slice,
    array_slice_argument,
)
from .utils.sort import sort_quad
from .utils.detection import (
    detect_value,
    detect_color,
    orthogonal_colors,
    monochromatic_concentration_analysis,
    detect_closest_point,
)
from .utils.timings import timing_decorator
from .utils.coloranalysis import hsv_spectrum
from .utils.features import FeatureDetection, harris_corners
from .utils.segmentation import (
    segment,
    label_image,
    group_labels,
    reassign_labels,
    make_consecutive,
    scharr_edges,
)
from .utils.linalg import cg as linalg_cg, gmres as linalg_gmres, KSP
from .utils.interpolation import (
    interpolate_to_image,
    interpolate_to_image_from_csv,
    interpolate_measurements_2d,
    polynomial_interpolation,
    illumination_interpolation,
)
from .utils.extractcharacteristicdata import extract_characteristic_data
from .utils.approximations import (
    ApproximationSpace,
    PolynomialApproximationSpace,
    RadialPolynomialApproximationSpace,
    LinearApproximation,
)

# ---- L6: measure / optimal transport
from .utils.grid import Grid, generate_grid
from .utils.fv import (
    FVDivergence,
    FVMass,
    FVTangentialFaceReconstruction,
    FVFullFaceReconstruction,
    face_to_cell,
    cell_to_face_average,
)
from .utils import quadrature
from .utils.convergence_status import ConvergenceStatus
from .measure.integration import (
    Geometry,
    WeightedGeometry,
    ExtrudedGeometry,
    PorousGeometry,
    ExtrudedPorousGeometry,
)
from .measure.beckmann import (
    L1Mode,
    MobilityMode,
    BeckmannProblem,
    BeckmannNewtonSolver,
    BeckmannBregmanSolver,
    BeckmannGproxPGHDSolver,
    BeckmannConvergenceCriteria,
    BeckmannConvergenceHistory,
)
from .measure.emd import EMD
from .measure.wasserstein import (
    wasserstein_distance,
    wasserstein_distance_3d,
    wasserstein_distance_to_vtk,
)
from .utils import plotting
from .utils.plotting import to_vtk

# ---- ops (TPU compute primitives; exposed for power users)
from .ops import color as color_ops
from .ops import warp as warp_ops
from .ops.resize import resize_array

# ---- L8: presets / application layer
from .corrections.color.colorcheckerfinder import (
    ColorCheckerPosition,
    find_colorchecker,
)
from .restoration.averaging import porosity_based_averaging
from .utils.morphology import find_boundaries
from .presets.analysis.multichromatictracer import MultichromaticTracerAnalysis
from .presets.analysis.porosity import PorosityAnalysis, patched_porosity_analysis
from .presets.workflows.facies_props import FaciesProps
from .presets.workflows.rig import Rig
from .presets.workflows.mode_resolution import (
    LEGACY_COLOR_TO_MASS_MODES,
    SCALAR_PRODUCT_MODES,
    parse_color_mode,
    validate_mode_syntax,
    mode_requires_color_to_mass,
    resolve_mode_image,
)
from .presets.workflows.config import FluidFlowerConfig, MultiFluidFlowerConfig
from .signals.models.pwtransformation import PWTransformation
from .utils.standard_images import StandardDtype, roi_to_mask
from .presets.workflows.simple_run_analysis import SimpleRunAnalysis
from .presets.workflows.heterogeneous_color_analysis import HeterogeneousColorAnalysis
from .presets.workflows.heterogeneous_color_to_mass_analysis import (
    HeterogeneousColorToMassAnalysis,
    HeterogeneousCalibrationSession,
)
from .presets.workflows.analysis.expert_knowledge import ExpertKnowledgeAdapter
from .signals.models.thresholdmodel import ThresholdModel
from .presets.fluidflower import (
    benchmark_binary_cleaning_preset,
    benchmark_concentration_analysis_preset,
    FluidFlowerRig,
    FluidFlowerCO2Analysis,
    FluidFlowerTracerAnalysis,
    SimpleFluidFlower,
)
from .assistants import (
    BaseAssistant,
    PointSelectionAssistant,
    BoxSelectionAssistant,
    RectangleSelectionAssistant,
    SubregionAssistant,
    RotationCorrectionAssistant,
    CropAssistant,
    LabelsSegmentAssistant,
    LabelsMaskSelectionAssistant,
    LabelsPickAssistant,
    LabelsMergeAssistant,
    LabelsAssistant,
)

# ---- parity completions
from .measure.beckmann_linalg import (
    BeckmannLinearSolverType,
    BeckmannLinearSolver,
    BeckmannDirectSolver,
    BeckmannAMGSolver,
    BeckmannCGSolver,
    BeckmannKSPSolver,
    BeckmannKSPFieldSplitSolver,
    BeckmannLinearSolverFactory,
)
from .corrections.color.colorcorrection import ClassicColorChecker
from .experiment.protocols import ImagingProtocolOld
from .multiphase.fluidflower_co2_meta import FluidFlowerCO2Meta
from .presets.workflows.simple_run_analysis import SimpleMultiphaseTimeSeriesData
from .utils.arithmetics import array_product
from .utils import augmented_plotting
from .utils import linalg
from .utils.augmented_plotting import (
    plot_contour_on_image,
    plot_distribution_on_image,
    plot_image_statistics,
)
from .assistants.labels_assistant import LabelsAssistantMenu, MonochromaticAssistant
from .corrections.shape.curvature import (
    load_curvature_correction_config_from_toml,
    load_curvature_correction_config_from_dict,
)

# Vectorized replacements keep the reference's numba-suffixed names alive.
color_to_index_numba = color_to_index
flatten_index_numba = flatten_index
from .experiment.events import find_images_for_datetimes
