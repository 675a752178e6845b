"""Multiprocessing dataloader workers: order, determinism, parity with sync.

The reference leans on torch DataLoader worker processes for its CPU-bound
``__getitem__`` (pickle + PIL + quantize); our fork-pool equivalent must
yield the SAME batches in the SAME order as the synchronous path whenever
augmentation is off, and a reproducible (seeded) stream when it is on.
"""

import numpy as np

from fusiontransformer_tpu.data.collate import get_collate
from fusiontransformer_tpu.data.loader import DataLoader
from fusiontransformer_tpu.data.synthetic import SyntheticSCN

H, W = 20, 30


def _loader(num_workers, shuffle=False, seed=7, prefetch=0, aug=None):
    ds = SyntheticSCN(split=("val",), num_scans=7, num_points=400,
                      image_height=H, image_width=W, output_orig=False,
                      **(aug or {}))
    collate = get_collate(is_train=True, batch_size=2, point_capacity=512,
                          image_height=H, image_width=W)
    return DataLoader(ds, 2, collate, shuffle=shuffle, drop_last=False,
                      seed=seed, prefetch=prefetch, num_workers=num_workers)


def _arrays(batch):
    return {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}


def test_mp_loader_matches_sync_without_augmentation():
    sync = list(_loader(0))
    mp2 = list(_loader(2))
    assert len(sync) == len(mp2) == 4   # ceil(7/2)
    for a, b in zip(sync, mp2):
        for k, va in _arrays(a).items():
            np.testing.assert_array_equal(va, b[k], err_msg=k)


def test_mp_loader_is_reproducible_across_worker_counts():
    aug = dict(noisy_rot=0.1, rot_z=6.28, transl=True)
    a = list(_loader(1, aug=aug))
    b = list(_loader(3, aug=aug))
    for xa, xb in zip(a, b):
        for k, va in _arrays(xa).items():
            np.testing.assert_array_equal(va, xb[k], err_msg=k)


def test_mp_loader_after_jax_backend_init():
    """Regression: plain fork from a process with live XLA runtime threads
    deadlocks (workers inherit held locks and sit at 0 CPU forever); the
    forkserver pool must work AFTER the backend has run real programs."""
    import jax.numpy as jnp
    _ = (jnp.ones((128, 128)) @ jnp.ones((128, 128))).block_until_ready()
    out = list(_loader(2))
    assert len(out) == 4


def test_mp_loader_kitti_dataset_is_picklable():
    """KITTI dataset members (label-map LUTs) must survive the worker
    pickle round-trip (forkserver workers receive the dataset by pickle)."""
    import pickle

    from fusiontransformer_tpu.data.semantic_kitti.semantic_kitti_dataloader \
        import SemanticKITTISCN

    ds = SemanticKITTISCN(split=("train",), preprocess_dir="/nonexistent",
                          debug=False)
    ds2 = pickle.loads(pickle.dumps(ds))
    lab = ds2.map_label(np.array([10, 13, 0]))
    np.testing.assert_array_equal(lab, ds.map_label(np.array([10, 13, 0])))


def test_mp_loader_shuffle_epochs():
    ld = _loader(2, shuffle=True)
    e0 = [tuple(b["filename"]) for b in ld]
    ld.set_epoch(1)
    e1 = [tuple(b["filename"]) for b in ld]
    assert sorted(sum(e0, ())) == sorted(sum(e1, ()))   # same scans
    assert e0 != e1                                      # different order
