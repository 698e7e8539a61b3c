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
