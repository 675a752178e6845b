"""Native C++ host kernels vs numpy reference."""

import numpy as np
import pytest

from fusiontransformer_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable (no g++)")
    return True


def test_native_quantize_matches_numpy(lib_ok, rng):
    coords = rng.randint(0, 100, (5000, 3)).astype(np.int32)
    uniq_n, inv_n = native.quantize(coords)
    _, uniq_ref, inv_ref = np.unique(coords, axis=0, return_index=True,
                                     return_inverse=True)
    np.testing.assert_array_equal(np.sort(uniq_n), np.sort(uniq_ref))
    # Same grouping: voxel coords per slot agree.
    np.testing.assert_array_equal(coords[uniq_n][inv_n], coords[uniq_ref][inv_ref.reshape(-1)])
    # Representative index maps back to its own slot.
    np.testing.assert_array_equal(inv_n[uniq_n], np.arange(len(uniq_n)))


def test_native_projection_matches_numpy(lib_ok, rng):
    pts = rng.randn(2000, 3).astype(np.float32) * 10
    pts[:, 0] += 5
    proj = np.array([[200.0, -300, 0, 10], [0, -5, -300, 4],
                     [1.0, 0, 0, 0]], np.float32)
    keep_n, rc_n = native.project_frustum(pts, proj, 640.0, 480.0)

    keep = pts[:, 0] > 0
    h = np.concatenate([pts[keep], np.ones((keep.sum(), 1), np.float32)], 1)
    ip = (proj @ h.T).T
    ip = ip[:, :2] / ip[:, 2:3]
    ok = (ip[:, 0] > 0) & (ip[:, 0] < 640) & (ip[:, 1] > 0) & (ip[:, 1] < 480)
    keep_ref = keep.copy()
    keep_ref[keep] = ok
    np.testing.assert_array_equal(keep_n, keep_ref)
    np.testing.assert_allclose(rc_n, np.fliplr(ip[ok]), rtol=1e-5, atol=1e-3)
