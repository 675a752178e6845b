"""Training metrics (reference ``models/metric.py``).

``SegIoU`` accumulates a confusion matrix from per-point logits, ignoring
class 0 (reference ``models/metric.py:26-82``).  The heavy work (argmax +
bincount) runs on device via a jitted helper; accumulation is a host-side
numpy matrix so it composes with any training loop and with ``jax.lax.psum``
when used inside a sharded eval step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fusiontransformer_tpu.utils.metric_logger import AverageMeter


@functools.partial(jax.jit, static_argnums=(3,))
def confusion_matrix_from_logits(logits, labels, valid, num_classes: int,
                                 ignore_index: int = 0):
    """[C, C] confusion matrix (rows = gt, cols = pred), ignoring class 0."""
    pred = jnp.argmax(logits, axis=-1)
    mask = valid & (labels != ignore_index)
    idx = labels * num_classes + pred
    idx = jnp.where(mask, idx, num_classes * num_classes)
    counts = jnp.zeros((num_classes * num_classes + 1,), jnp.int32)
    counts = counts.at[idx].add(1)
    return counts[:-1].reshape(num_classes, num_classes)


class SegAccuracy(AverageMeter):
    """Segmentation accuracy (reference ``models/metric.py:5-23``)."""

    name = "seg_acc"

    def __init__(self, ignore_index=-100):
        super().__init__()
        self.ignore_index = ignore_index

    def update_dict(self, preds, labels):
        logit = np.asarray(preds["seg_logit"])
        label = np.asarray(labels["seg_label"])
        pred = logit.argmax(-1)
        mask = label != self.ignore_index
        tp = (pred[mask] == label[mask]).sum()
        self.update(float(tp), int(mask.sum()))


class SegIoU:
    """Confusion-matrix mean-IoU metric; routes on '2d'/'3d' in its name."""

    def __init__(self, num_classes, ignore_index=0, name="seg_iou"):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.name = name
        self.mat = None

    def update_dict(self, preds, labels):
        if "3d" in self.name:
            logit = preds["lidar_seg_logit"]
        elif "2d" in self.name:
            logit = preds["img_seg_logit"]
        else:
            logit = preds["seg_logit"]
        label = labels["seg_label"]
        valid = labels.get("pt_valid")
        if valid is None:
            valid = jnp.ones(label.shape, bool)
        cm = confusion_matrix_from_logits(logit, label, valid,
                                          self.num_classes, self.ignore_index)
        self.update_matrix(np.asarray(cm))

    def update_matrix(self, cm: np.ndarray):
        if self.mat is None:
            self.mat = np.zeros((self.num_classes, self.num_classes), np.int64)
        self.mat += cm.astype(np.int64)

    def reset(self):
        self.mat = None

    @property
    def iou(self):
        h = self.mat.astype(np.float64)
        diag = np.diag(h)
        denom = h.sum(1) + h.sum(0) - diag
        with np.errstate(divide="ignore", invalid="ignore"):
            return diag / denom

    @property
    def global_avg(self):
        return float(np.nanmean(self.iou)) if self.mat is not None else 0.0

    @property
    def avg(self):
        return self.global_avg

    def __str__(self):
        return "{:.4f}".format(self.global_avg)

    @property
    def summary_str(self):
        return str(self)
