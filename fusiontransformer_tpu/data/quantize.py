"""Host-side voxel quantization (torchsparse ``sparse_quantize`` equivalent,
reference call site ``data/semantic_kitti/semantic_kitti_dataloader.py:231``).

Sort-based unique instead of CPU hash tables.  Returns the indices of one
representative point per occupied voxel and the inverse map (original point ->
unique-voxel slot) used by eval-time devoxelization
(``data/utils/validate.py:79-98``).
"""

from __future__ import annotations

import numpy as np

from fusiontransformer_tpu import native


def sparse_quantize(coords: np.ndarray):
    """Args: int voxel coords [N, 3].  Returns (unique_idx [U], inverse [N]).

    Uses the native C++ sort-unique when the shared library is built
    (fusiontransformer_tpu/native), else numpy."""
    if native.available():
        return native.quantize(coords)
    _, unique_idx, inverse = np.unique(
        coords, axis=0, return_index=True, return_inverse=True)
    return unique_idx.astype(np.int64), inverse.reshape(-1).astype(np.int64)
