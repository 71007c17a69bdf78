"""Signal layer tests: reductions, models, kernel interpolation,
concentration analysis pipeline."""

import numpy as np
import pytest

import darsia_tpu as da


def test_monochromatic_reduction_channels():
    rng = np.random.default_rng(0)
    img = rng.random((10, 12, 3)).astype(np.float32)
    assert np.allclose(
        np.asarray(da.MonochromaticReduction(color="red")(img)), img[..., 0]
    )
    gray = np.asarray(da.MonochromaticReduction(color="gray")(img))
    expected = img @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    assert np.allclose(gray, expected, atol=1e-5)
    rg = np.asarray(da.MonochromaticReduction(color="red+green")(img))
    assert np.allclose(rg, img[..., 0] + img[..., 1], atol=1e-6)


def test_linear_models():
    img = np.ones((4, 4), dtype=np.float32)
    assert np.allclose(np.asarray(da.ScalingModel(scaling=2.0).call_array(img)), 2.0)
    model = da.LinearModel(scaling=3.0, offset=1.0)
    assert np.allclose(np.asarray(model.call_array(img)), 4.0)
    model.update_model_parameters(np.array([2.0, 0.5]))
    assert np.allclose(np.asarray(model.call_array(img)), 2.5)


def test_heterogeneous_linear_model():
    labels = np.zeros((6, 6), dtype=int)
    labels[:, 3:] = 1
    model = da.HeterogeneousLinearModel(
        labels, scaling=np.array([2.0, 3.0]), offset=np.array([0.0, 1.0])
    )
    img = np.ones((6, 6), dtype=np.float32)
    out = np.asarray(model.call_array(img))
    assert np.allclose(out[:, :3], 2.0)
    assert np.allclose(out[:, 3:], 4.0)


def test_clip_and_threshold_models():
    img = np.linspace(-1, 2, 16).reshape(4, 4).astype(np.float32)
    clipped = np.asarray(da.ClipModel(min_value=0.0, max_value=1.0).call_array(img))
    assert clipped.min() >= 0 and clipped.max() <= 1
    thresholded = np.asarray(da.StaticThresholdModel(threshold_lower=0.5)(img))
    assert thresholded.dtype == bool
    assert np.array_equal(thresholded, img > 0.5)


def test_static_threshold_heterogeneous():
    labels = np.zeros((4, 4), dtype=int)
    labels[:, 2:] = 1
    model = da.StaticThresholdModel(
        threshold_lower=[0.2, 0.8], labels=labels
    )
    img = np.full((4, 4), 0.5, dtype=np.float32)
    out = np.asarray(model(img))
    assert out[:, :2].all() and not out[:, 2:].any()


def test_otsu_threshold_bimodal():
    rng = np.random.default_rng(1)
    values = np.concatenate(
        [rng.normal(0.2, 0.02, 500), rng.normal(0.8, 0.02, 500)]
    )
    t = da.otsu_threshold(values)
    # Any threshold in the inter-mode gap is a valid Otsu optimum (argmax
    # picks the first maximizing bin, like skimage): assert separation.
    assert (values[:500] < t).all() and (values[500:] > t).all()


def test_dynamic_threshold_model():
    rng = np.random.default_rng(2)
    img = np.where(
        rng.random((32, 32)) > 0.5,
        rng.normal(0.8, 0.02, (32, 32)),
        rng.normal(0.2, 0.02, (32, 32)),
    ).astype(np.float32)
    model = da.DynamicThresholdModel(method="otsu")
    out = np.asarray(model(img))
    assert np.array_equal(out, img > model._threshold_lower)
    # Threshold lands between the modes (Otsu picks the start of the
    # flat inter-mode plateau).
    assert 0.25 < model._threshold_lower < 0.75
    assert np.array_equal(out, img > 0.5)  # separates the two modes exactly


def test_kernel_interpolation_exact_at_supports():
    rng = np.random.default_rng(3)
    supports = rng.random((6, 3)).astype(np.float32)
    values = rng.random(6).astype(np.float32)
    interp = da.KernelInterpolation(da.GaussianKernel(gamma=5.0), supports, values)
    out = np.asarray(interp.call_array(supports))
    assert np.allclose(out, values, atol=1e-3)
    # Image-shaped input
    img = rng.random((8, 8, 3)).astype(np.float32)
    out_img = np.asarray(interp.call_array(img))
    assert out_img.shape == (8, 8)


def test_linear_kernel_combination():
    supports = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype=np.float32)
    weights = np.array([2.0, 3.0], dtype=np.float32)
    kernel = da.LinearKernel(a=0.5)
    signal = np.array([[0.5, 0.5, 0.0]], dtype=np.float32)
    out = np.asarray(kernel.linear_combination(signal, supports, weights))
    expected = 2.0 * (0.5 + 0.5) + 3.0 * (0.5 + 0.5)
    assert np.allclose(out, expected, atol=1e-5)


def test_combined_model():
    chain = da.CombinedModel(
        [da.LinearModel(scaling=2.0, offset=0.0), da.ClipModel(max_value=1.0)]
    )
    img = np.full((3, 3), 0.7, dtype=np.float32)
    out = np.asarray(chain(img))
    assert np.allclose(out, 1.0)


def test_binary_data_selector_value_criterion():
    signal = np.zeros((20, 20), dtype=np.float32)
    signal[2:6, 2:6] = 1.0   # strong region
    signal[12:16, 12:16] = 0.1  # weak region
    mask = signal > 0.05
    selector = da.BinaryDataSelector(criterion=da.ValueCriterion(0.5))
    out = selector(signal, mask, signal)
    assert out[3, 3] and not out[13, 13]


def test_concentration_analysis_pipeline():
    rng = np.random.default_rng(4)
    base_arr = np.full((32, 32, 3), 0.4, dtype=np.float32)
    base = da.OpticalImage(base_arr, width=1.0, height=1.0)
    # Probe with a plume: increased red channel in a blob
    probe_arr = base_arr.copy()
    probe_arr[8:24, 8:24, 0] += 0.4
    probe = da.OpticalImage(probe_arr, width=1.0, height=1.0)

    analysis = da.ConcentrationAnalysis(
        base=base,
        signal_reduction=da.MonochromaticReduction(color="red"),
        restoration=da.TVD(method="chambolle", weight=0.05),
        model=da.LinearModel(scaling=2.5, offset=0.0),
    )
    concentration = analysis(probe)
    assert isinstance(concentration, da.ScalarImage)
    out = concentration.as_numpy()
    assert out[12:20, 12:20].mean() > 0.8  # plume detected, scaled by 2.5
    assert out[:4, :4].mean() < 0.1  # background clean


def test_concentration_analysis_time_series_batch():
    """A series image runs the fused pipeline vmapped over the time axis
    in ONE dispatch and matches the per-slice results exactly."""
    base_arr = np.full((24, 24, 3), 0.4, dtype=np.float32)
    base = da.OpticalImage(base_arr, width=1.0, height=1.0)
    frames = []
    for k in range(4):
        arr = base_arr.copy()
        arr[4 + 2 * k : 12 + 2 * k, 4:12, 0] += 0.1 * (k + 1)
        frames.append(arr)
    series_data = np.stack(frames, axis=2)  # (H, W, T, C)
    series = da.OpticalImage(
        series_data, width=1.0, height=1.0, series=True
    )

    analysis = da.ConcentrationAnalysis(
        base=base,
        signal_reduction=da.MonochromaticReduction(color="red"),
        model=da.LinearModel(scaling=2.0, offset=0.0),
    )
    out_series = analysis(series)
    assert isinstance(out_series, da.ScalarImage)
    assert out_series.series and out_series.time_num == 4
    # exact agreement with the per-slice path
    for k in range(4):
        single = analysis(series.time_slice(k))
        np.testing.assert_allclose(
            np.asarray(out_series.time_slice(k).img),
            np.asarray(single.img),
            rtol=0,
            atol=1e-6,
        )


def test_concentration_cleaning_filter():
    rng = np.random.default_rng(5)
    base1 = da.OpticalImage(
        np.full((16, 16, 3), 0.4, dtype=np.float32), width=1.0, height=1.0
    )
    noise = 0.05 * rng.random((16, 16, 3)).astype(np.float32)
    base2 = da.OpticalImage(
        base1.as_numpy() + noise, width=1.0, height=1.0
    )
    analysis = da.ConcentrationAnalysis(
        base=[base1, base2],
        signal_reduction=da.MonochromaticReduction(color="red"),
    )
    assert analysis.threshold_cleaning_filter is not None
    # Cleaning filter removes the learned noise.
    out = analysis(base2)
    assert out.as_numpy().max() <= 1e-6
