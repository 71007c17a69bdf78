"""Sixth API-surface cluster: method-level parity fills found by the
namespace/method audit against the live reference (kernel updates, EMD
matrices, flash dicts, experiment iteration, color-range serialization,
spectra distances, meta helpers)."""

import numpy as np
import pytest

import darsia_tpu as da


def test_kernel_interpolation_update_kernel():
    ki = da.KernelInterpolation(
        kernel=da.GaussianKernel(gamma=1.0),
        supports=np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]),
        values=np.array([0.0, 1.0]),
    )
    before = np.asarray(ki.interpolation_weights).copy()
    ki.update_kernel(da.GaussianKernel(gamma=10.0))
    after = np.asarray(ki.interpolation_weights)
    assert not np.allclose(before, after)
    # interpolation at supports still reproduces the values
    out = np.asarray(ki.call_array(ki.supports))
    np.testing.assert_allclose(out, [0.0, 1.0], atol=1e-4)


def test_advanced_kernel_interpolation_variable_updates():
    aki = da.AdvancedKernelInterpolation(da.GaussianKernel(gamma=2.0))
    aki.fix_supports(np.array([[0.0, 0.0, 0.0]]), np.array([0.0]))
    aki.update_advanced(
        variable_supports=np.array([[1.0, 1.0, 1.0], [2.0, 0.0, 0.0]]),
        variable_values=np.array([1.0, 2.0]),
    )
    assert aki.num_variable_supports == 2
    assert aki.num_supports == 3
    aki.update_variable_model_parameters(np.array([5.0, 6.0]))
    out = np.asarray(aki.call_array(np.array([[1.0, 1.0, 1.0]])))
    assert out[0] == pytest.approx(5.0, abs=0.2)
    with pytest.raises(ValueError):
        aki.update_variable_model_parameters(np.array([1.0]))


def test_emd_distance_matrix():
    meta = {"width": 1.0, "height": 1.0, "scalar": True}
    a = np.zeros((12, 12)); a[2:5, 2:5] = 1.0
    b = np.zeros((12, 12)); b[7:10, 7:10] = 1.0
    imgs = [da.Image(a, **meta), da.Image(b, **meta), da.Image(a.copy(), **meta)]
    emd = da.EMD()
    m = emd.distance_matrix(imgs)
    assert m.shape == (3, 3)
    assert np.allclose(m, m.T)
    assert np.allclose(np.diag(m), 0.0)
    assert m[0, 1] > 0 and m[0, 2] == pytest.approx(0.0, abs=1e-12)


def test_simple_flash_dict_roundtrip():
    flash = da.SimpleFlash(
        min_value_aq=0.1, max_value_aq=0.5, min_value_g=0.5, max_value_g=0.9
    )
    clone = da.SimpleFlash.from_dict(flash.to_dict())
    assert clone.to_dict() == flash.to_dict()


def test_co2_mass_temperature_presets():
    analysis = da.CO2MassAnalysis.__new__(da.CO2MassAnalysis)
    analysis.setup_20_degrees_celsius()
    analysis.setup_23_degrees_celsius()
    p20, rho20 = analysis.data_NIST_20
    p23, rho23 = analysis.data_NIST_23
    assert len(p20) == len(rho20) == 61
    assert p20[0] == pytest.approx(0.90) and p20[-1] == pytest.approx(1.50)
    # NIST anchors: 1.6328 kg/m^3 @ (0.90 bar, 20 C); denser when colder
    assert rho20[0] == pytest.approx(1.6328, rel=5e-3)
    assert all(r20 > r23 for r20, r23 in zip(rho20, rho23))
    assert analysis.water_density_20 == pytest.approx(998.21, rel=1e-3)
    assert analysis.water_density_23 == pytest.approx(997.62, rel=1e-3)


def test_experiment_iter_available(tmp_path):
    import pandas as pd

    folder = tmp_path / "imgs"
    folder.mkdir()
    rows = []
    for k in range(3):
        (folder / f"img_{k:03d}.jpg").touch()
        rows.append((k, f"2026-01-01 12:0{k}:00"))
    protocol = tmp_path / "imaging.csv"
    pd.DataFrame(rows, columns=["image_id", "datetime"]).to_csv(
        protocol, index=False
    )
    exp = da.ProtocolledExperiment(
        data=[folder],
        imaging_protocol=protocol,
        pad=3,
    )
    paths = sorted(folder.glob("*.jpg")) + [folder / "unknown.jpg"]
    available = exp.iter_available(paths)
    assert [idx for idx, _, _ in available] == [0, 1, 2]
    assert all(d is not None for _, _, d in available)


def test_color_range_from_images_and_dict():
    meta = {"width": 1.0, "height": 1.0}
    base = da.Image(np.full((8, 8, 3), 0.5, np.float32), **meta)
    img = da.Image(
        np.clip(np.full((8, 8, 3), 0.5) + np.array([0.2, 0.0, -0.1]), 0, 1
        ).astype(np.float32), **meta,
    )
    cr = da.ColorRange.from_images([img], baseline=base)
    assert cr.color_mode == da.ColorMode.RELATIVE
    np.testing.assert_allclose(cr.min_color, [0.2, 0.0, -0.1], atol=1e-6)
    clone = da.ColorRange.load_from_dict(cr.to_dict())
    np.testing.assert_allclose(clone.max_color, cr.max_color)
    assert clone.color_mode == cr.color_mode


def test_discrete_color_range_index_methods():
    dcr = da.DiscreteColorRange(resolution=11)
    dcr.fit(np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]))
    idx = dcr.color_to_index(np.array([0.5, 0.5, 0.5]))
    assert idx.tolist() == [5, 5, 5]
    flat = dcr.flat_color_index(np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]))
    assert flat[0] == 0 and flat[1] == 11**3 - 1
    clone = da.DiscreteColorRange.load_from_dict(dcr.to_dict())
    assert clone.occupancy == dcr.occupancy


def test_color_spectrum_distance_and_membership():
    spec = da.ColorSpectrum(resolution=11, base_color=np.full(3, 0.5))
    spec.fit(np.array([[0.1, 0.0, 0.0], [0.2, 0.0, 0.0]]))
    assert spec.distance(np.array([0.1, 0.0, 0.0])) == pytest.approx(0.0, abs=0.06)
    assert spec.distance(np.array([0.1, 0.4, 0.0])) == pytest.approx(0.4, abs=0.06)
    member = spec.in_spectrum(
        np.array([[0.1, 0.0, 0.0], [0.9, 0.9, 0.9]]), da.ColorMode.RELATIVE
    )
    assert member.tolist() == [True, False]
    # absolute colors shift by the base color first
    member_abs = spec.in_spectrum(
        np.array([[0.6, 0.5, 0.5]]), da.ColorMode.ABSOLUTE
    )
    assert member_abs.tolist() == [True]


def test_pwtransformation_values_from_diff():
    pw = da.PWTransformation()
    values = pw.values_from_diff([1.0, 2.0, 0.5])
    np.testing.assert_allclose(values, [0.0, 1.0, 3.0, 3.5])
    pw.update(supports=np.array([0.0, 0.2, 0.6, 1.0]), values=values)
    assert float(np.asarray(pw.call_array(np.array(0.2)))) == pytest.approx(1.0)


def test_coordinate_transformation_correct_metadata():
    meta = {"width": 1.0, "height": 1.0, "scalar": True}
    src = da.Image(np.zeros((10, 10), np.float32), **meta)
    dst = da.Image(np.zeros((20, 20), np.float32), width=2.0, height=2.0,
                   scalar=True)
    pts = da.make_voxel([[0, 0], [0, 9], [9, 9], [9, 0]])
    pts_dst = da.make_voxel([[0, 0], [0, 19], [19, 19], [19, 0]])
    ct = da.CoordinateTransformation(
        src.coordinatesystem, dst.coordinatesystem, pts, pts_dst
    )
    new_meta = ct.correct_metadata(src)
    assert new_meta["dimensions"] == [2.0, 2.0]


def test_fluidflower_meta_helpers(tmp_path):
    toml = tmp_path / "meta.toml"
    toml.write_text('[info]\nname = "run1"\n')
    json_file = tmp_path / "meta.json"
    json_file.write_text('{"info": {"name": "run2"}}')
    from darsia_tpu.multiphase.fluidflower_co2_meta import FluidFlowerCO2Meta

    assert FluidFlowerCO2Meta.load_meta(toml)["info"]["name"] == "run1"
    assert FluidFlowerCO2Meta.load_meta(json_file)["info"]["name"] == "run2"


def test_feature_extract_and_match():
    rng = np.random.default_rng(3)
    img = np.kron(rng.random((8, 8)), np.ones((8, 8))).astype(np.float32)
    shifted = np.roll(img, shift=(3, 5), axis=(0, 1))
    feats_a = da.FeatureDetection.extract_features(img, max_features=40)
    feats_b = da.FeatureDetection.extract_features(shifted, max_features=40)
    assert feats_a[0].shape[1] == 2 and feats_a[1].shape[1] == 64
    pts_src, pts_dst, matches = da.FeatureDetection.match_features(
        feats_a, feats_b, keep_percent=0.25, return_matches=True
    )
    assert len(pts_src) == len(pts_dst) == len(matches) > 0
    # dominant displacement of the matches ≈ the true roll (mod wrap)
    disp = np.median(pts_dst - pts_src, axis=0)
    assert np.allclose(np.abs(disp), [3.0, 5.0], atol=1.5) or np.allclose(
        np.abs(disp), [61.0, 59.0], atol=1.5
    )
