"""Dataloader factory (reference ``data/build.py:13-89``).

Selects the dataset class by DATASET.TYPE, the split tuple by mode, pops the
augmentation subtree for train only, and wraps everything in the padded
static-shape collate + prefetching loader.  Distributed mode shards scan
indices per process (the TPU equivalent of DistributedSampler).
"""

from __future__ import annotations

from fusiontransformer_tpu.data.collate import get_collate
from fusiontransformer_tpu.data.loader import DataLoader
from fusiontransformer_tpu.data.semantic_kitti.semantic_kitti_dataloader import (
    DebugSemanticKITTISCN, SemanticKITTISCN)
from fusiontransformer_tpu.data.synthetic import SyntheticSCN

DATASETS = {
    "SemanticKITTISCN": SemanticKITTISCN,
    "DebugSemanticKITTISCN": DebugSemanticKITTISCN,
    "SyntheticSCN": SyntheticSCN,
}


def build_dataloader(cfg, mode="train", use_distributed=False, rank=0,
                     world_size=1, seed=0, batch_size=None):
    assert mode in ("train", "val", "test")
    dataset_cfg = cfg.DATASET
    split = tuple(dataset_cfg[mode.upper()])
    is_train = mode == "train"

    if batch_size is None:
        if is_train:
            batch_size = cfg.TRAIN.BATCH_SIZE
        elif mode == "test":
            batch_size = cfg.TEST.BATCH_SIZE
        else:
            batch_size = cfg.VAL.BATCH_SIZE

    kwargs = dict(dataset_cfg.get(dataset_cfg.TYPE, {}))
    augmentation = dict(kwargs.pop("augmentation", {}))
    if not is_train:
        augmentation = {}
    # Drop None-valued augmentation entries (schema uses None for "off").
    augmentation = {k: v for k, v in augmentation.items() if v is not None}

    if dataset_cfg.TYPE == "NuScenesSCN":
        from fusiontransformer_tpu.data.nuscenes.nuscenes_dataloader import (
            NuScenesSCN)
        dataset = NuScenesSCN(split=split, output_orig=not is_train,
                              **kwargs, **augmentation)
    elif dataset_cfg.TYPE in DATASETS:
        dataset = DATASETS[dataset_cfg.TYPE](
            split=split, output_orig=not is_train, **kwargs, **augmentation)
    else:
        raise ValueError(f"Unsupported dataset type: {dataset_cfg.TYPE}")

    if use_distributed and world_size > 1:
        dataset = _ShardedView(dataset, rank, world_size)

    image_height = kwargs.get("image_height",
                              getattr(dataset, "image_height", 370))
    image_width = kwargs.get("image_width",
                             getattr(dataset, "image_width", 1226))
    # bottom_crop shrinks train images to (crop_h, crop_w); the batch buffer
    # must match (the ViT consumes the crop, reference dataloader :169-191),
    # while point lifting keeps the fixed full-res token mapping.
    if is_train and augmentation.get("bottom_crop"):
        crop_w, crop_h = augmentation["bottom_crop"]
        image_width, image_height = crop_w, crop_h
    buckets = tuple(cfg.TPU.CAPACITY_BUCKETS)
    if buckets:
        # A misconfigured ladder whose top bucket is below POINT_CAPACITY
        # would silently shrink the batch buffer below the capacity that
        # level_caps_from_cfg sizes init/eval for, dropping points with only
        # num_dropped as a trace.  Fail loudly instead.
        assert max(buckets) == cfg.TPU.POINT_CAPACITY, (
            f"max(TPU.CAPACITY_BUCKETS)={max(buckets)} must equal "
            f"TPU.POINT_CAPACITY={cfg.TPU.POINT_CAPACITY}")
        # Multi-host: each host's collate picks the bucket for ITS shard;
        # the distributed trainer re-pads every batch to the global max
        # bucket before the (cross-host) train step so all ranks trace the
        # same shapes (DistributedTrainer._sync_bucket_capacity — one tiny
        # int allgather per step).  Host-local eval steps have no cross-host
        # collectives and need no synchronization.
    # TPU.ADAPTIVE_LEVEL_CAPS: collate carries exact per-level voxel counts
    # (host-side ints) so the trainer can size voxel capacities to the data.
    n_levels = (1 + len(cfg.TPU.LEVEL_CAPACITY_FRACTIONS)
                if ("ADAPTIVE_LEVEL_CAPS" in cfg.TPU
                    and cfg.TPU.ADAPTIVE_LEVEL_CAPS) else 0)
    slot_pool = _slot_pool_spec(cfg, use_lidar_model=cfg.MODEL.USE_LIDAR,
                                world_size=world_size)
    if slot_pool is not None and not n_levels:
        n_levels = slot_pool.num_levels
    collate = get_collate(is_train=is_train, batch_size=batch_size,
                          point_capacity=cfg.TPU.POINT_CAPACITY,
                          image_height=image_height, image_width=image_width,
                          capacity_buckets=buckets, level_counts=n_levels,
                          slot_pool=slot_pool)
    # NUM_WORKERS > 0 forks a worker pool (torch-DataLoader equivalent:
    # decode/augment/quantize/collate in parallel); 0 keeps a single
    # prefetch thread so the host still overlaps the device step.
    return DataLoader(dataset, batch_size, collate, shuffle=is_train,
                      drop_last=False, seed=seed + cfg.RNG_SEED,
                      prefetch=max(1, cfg.DATALOADER.NUM_WORKERS),
                      num_workers=cfg.DATALOADER.NUM_WORKERS)


def _slot_pool_spec(cfg, use_lidar_model, world_size):
    """Host-built group-pooled slot maps (TPU.CONV_SLOT_POOL, the r5 fast
    path): enabled on SINGLE-device single-process topologies only — the
    maps are assembled against the whole-batch hierarchy layout, while
    data-parallel steps build hierarchies per device shard (per-shard
    assembly is future work; those paths keep the per-voxel K-slot maps).
    """
    if not ("CONV_SLOT_POOL" in cfg.TPU and cfg.TPU.CONV_SLOT_POOL):
        return None
    if not use_lidar_model:
        return None
    if world_size > 1:
        return None
    n_dev = cfg.TPU.NUM_DEVICES
    if not n_dev:
        import jax       # resolve the live topology only when needed
        n_dev = jax.device_count()
    if n_dev > 1 or (int(cfg.TPU.MODEL_PARALLEL)
                     if "MODEL_PARALLEL" in cfg.TPU else 1) > 1:
        return None
    from fusiontransformer_tpu.ops.host_slots import SlotPoolSpec
    slot_levels = [l for l, k in enumerate(cfg.TPU.CONV_TAP_SLOTS) if k]
    if not slot_levels:
        return None
    adaptive = ("ADAPTIVE_LEVEL_CAPS" in cfg.TPU
                and cfg.TPU.ADAPTIVE_LEVEL_CAPS)
    quantum = (int(cfg.TPU.SLOT_POOL_QUANTUM)
               if "SLOT_POOL_QUANTUM" in cfg.TPU else 16)
    return SlotPoolSpec(slot_levels, cfg.TPU.L0_CAPACITY_FRACTION,
                        cfg.TPU.LEVEL_CAPACITY_FRACTIONS,
                        adaptive=adaptive, quantum=quantum)


class _ShardedView:
    """Per-process shard of a dataset (DistributedSampler equivalent)."""

    def __init__(self, dataset, rank, world_size):
        self.dataset = dataset
        self.rank = rank
        self.world_size = world_size
        for attr in ("class_names", "class_labels", "map_inverse_label",
                     "image_height", "image_width"):
            if hasattr(dataset, attr):
                setattr(self, attr, getattr(dataset, attr))

    def __len__(self):
        return (len(self.dataset) + self.world_size - 1) // self.world_size

    def __getitem__(self, i):
        return self.dataset[(i * self.world_size + self.rank)
                            % len(self.dataset)]
