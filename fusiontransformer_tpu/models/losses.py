"""Losses.

Primary losses (weighted CE + symmetric KL) mirror the inline computations in
the reference trainers (``modules/SemanticTrainer.py:157-178``); the auxiliary
domain-adaptation losses mirror ``models/losses.py:6-68`` (entropy,
log-coral), kept for component parity.

All losses are padding-aware: a ``valid`` mask selects live points, and the
weighted CE replicates torch's ``F.cross_entropy(weight=...)`` normalization
(weighted sum divided by the sum of the per-sample weights).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_cross_entropy(logits, labels, valid, class_weights=None):
    """torch F.cross_entropy parity with optional per-class weights.

    torch semantics: mean is Σ w[y_i]·ce_i / Σ w[y_i] over non-masked points.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    m = valid.astype(jnp.float32)
    if class_weights is not None:
        w = class_weights[labels] * m
    else:
        w = m
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-12)


def kl_divergence(student_logits, teacher_logits, valid):
    """F.kl_div(log_softmax(s), softmax(t.detach())).sum(1).mean() parity.

    The teacher is gradient-stopped by the caller contract (the reference
    detaches explicitly, ``SemanticTrainer.py:167-173``).
    """
    logp = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    q = jax.nn.softmax(
        jax.lax.stop_gradient(teacher_logits).astype(jnp.float32), axis=-1)
    logq = jax.nn.log_softmax(
        jax.lax.stop_gradient(teacher_logits).astype(jnp.float32), axis=-1)
    per = jnp.sum(q * (logq - logp), axis=-1)
    m = valid.astype(jnp.float32)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def entropy_loss(probs, valid):
    """Minimum-entropy regularizer (reference ``models/losses.py:6-19``)."""
    p = jnp.clip(probs.astype(jnp.float32), 1e-12, 1.0)
    ent = -jnp.sum(p * jnp.log(p), axis=-1) / jnp.log(probs.shape[-1] * 1.0)
    m = valid.astype(jnp.float32)
    return jnp.sum(ent * m) / jnp.maximum(jnp.sum(m), 1.0)


def logcoral_loss(x_src, x_trg, valid_src=None, valid_trg=None):
    """Geodesic covariance alignment (reference ``models/losses.py:22-68``).

    Uses the Euclidean surrogate ||C_s - C_t||^2_F / (4 d^2) on normalized
    covariances, mirroring the reference's stable branch (its NaN guards are
    unnecessary here because we clamp the denominator).
    """
    def cov(x, valid):
        if valid is not None:
            m = valid.astype(jnp.float32)[:, None]
            n = jnp.maximum(jnp.sum(m), 2.0)
            x = x * m
            mean = jnp.sum(x, 0, keepdims=True) / n
            xc = (x - mean) * m
        else:
            n = x.shape[0] * 1.0
            xc = x - jnp.mean(x, 0, keepdims=True)
        return (xc.T @ xc) / (n - 1.0)

    d = x_src.shape[-1]
    cs = cov(x_src.astype(jnp.float32), valid_src)
    ct = cov(x_trg.astype(jnp.float32), valid_trg)
    return jnp.mean((cs - ct) ** 2) / (4.0 * d)
