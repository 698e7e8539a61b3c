"""Native C++ frame preprocessing: build + parity with numpy fallback."""

import numpy as np
import pytest

from scail_tpu import native


def test_native_builds_and_matches_numpy(rng):
    lib = native.get_lib()
    if lib is None:
        pytest.skip("g++ unavailable; numpy fallback covered below")
    frames = rng.integers(0, 256, (7, 33, 41, 3)).astype(np.uint8)
    got = native.normalize_frames(frames)
    want = (frames.astype(np.float32).transpose(0, 3, 1, 2) - 127.5) / 127.5
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_center_crop_matches_numpy(rng):
    x = rng.standard_normal((3, 4, 20, 24)).astype(np.float32)
    got = native.center_crop(x, 2, 3, 10, 12)
    np.testing.assert_array_equal(got, x[:, :, 2:12, 3:15])


def test_normalize_fallback_path(rng, monkeypatch):
    monkeypatch.setattr(native, "get_lib", lambda: None)
    frames = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    out = native.normalize_frames(frames)
    assert out.shape == (2, 3, 8, 8)
    assert out.dtype == np.float32


def test_banded_extraction_reproduces_dense(rng):
    from scail_tpu.native import resize_kernels as rk

    for in_s, out_s, aa in [(37, 24, True), (24, 37, True),
                            (37, 24, False), (24, 37, False), (16, 16, True)]:
        mat = rk.resize_matrix(in_s, out_s, aa)
        lo, w = rk.banded(mat)
        dense = np.zeros_like(mat)
        for i in range(out_s):
            dense[i, lo[i] : lo[i] + w.shape[1]] = w[i]
        np.testing.assert_array_equal(dense, mat)


@pytest.mark.parametrize("aa", [True, False])
def test_host_resize_matches_device_path(rng, aa):
    """The native banded kernel and the jax einsum path share one weight
    source; outputs must agree to f32 rounding (down- and up-scale)."""
    from scail_tpu.ops.resize import resize_bicubic, resize_bilinear

    x = rng.standard_normal((2, 3, 29, 47)).astype(np.float32)
    for oh, ow in [(17, 31), (41, 59), (29, 31)]:
        got = native.resize_bicubic_host(x, oh, ow, antialias=aa)
        want = np.asarray(resize_bicubic(x, oh, ow, antialias=aa))
        np.testing.assert_allclose(got, want, atol=2e-5)
        got = native.resize_bilinear_host(x, oh, ow, antialias=aa)
        want = np.asarray(resize_bilinear(x, oh, ow, antialias=aa))
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_host_resize_numpy_fallback(rng, monkeypatch):
    from scail_tpu.ops.resize import resize_bicubic

    x = rng.standard_normal((1, 2, 19, 23)).astype(np.float32)
    want = np.asarray(resize_bicubic(x, 11, 13, antialias=True))
    got_native = native.resize_bicubic_host(x, 11, 13, antialias=True)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    got_np = native.resize_bicubic_host(x, 11, 13, antialias=True)
    np.testing.assert_allclose(got_np, want, atol=2e-5)
    np.testing.assert_allclose(got_np, got_native, atol=2e-5)


def test_rectangle_crop_host_equals_device(rng):
    """resize_for_rectangle_crop: numpy input (host path) must match jnp
    input (device path) bit-for-bit-ish at both crop modes."""
    import jax.numpy as jnp

    from scail_tpu.data.video import resize_for_rectangle_crop

    x = rng.standard_normal((3, 3, 36, 50)).astype(np.float32)
    host = resize_for_rectangle_crop(x, [24, 40], "center")
    assert isinstance(host, np.ndarray)
    dev = np.asarray(resize_for_rectangle_crop(jnp.asarray(x), [24, 40],
                                               "center"))
    np.testing.assert_allclose(host, dev, atol=2e-5)
    host = resize_for_rectangle_crop(
        x, [24, 40], "random", rng=np.random.default_rng(3))
    dev = np.asarray(resize_for_rectangle_crop(
        jnp.asarray(x), [24, 40], "random", rng=np.random.default_rng(3)))
    np.testing.assert_allclose(host, dev, atol=2e-5)


def test_smpl_downsample_host_equals_device(rng):
    import jax.numpy as jnp

    from scail_tpu.data.video import smpl_downsample

    x = rng.standard_normal((2, 3, 16, 20)).astype(np.float32)
    host = smpl_downsample(x)
    assert isinstance(host, np.ndarray)
    dev = np.asarray(smpl_downsample(jnp.asarray(x)))
    np.testing.assert_allclose(host, dev, atol=2e-5)
