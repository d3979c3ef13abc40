"""Loss functions: weighted cross-entropy (reference parity) and KD losses.

Cross-entropy matches torch's `nn.CrossEntropyLoss(ignore_index=-1,
weight=class_weights)` (reference: trainer.py:55) including its weighted-mean
normalization: the sum of per-pixel weighted NLLs is divided by the sum of the
*weights* of the contributing pixels, not the pixel count.

The KD losses are the new capability demanded by the north star (the reference
repo has no distillation despite its name, SURVEY.md §0).  The feature taps
follow the reference's intermediates contract (fusion_module.py:260-262).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def weighted_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """Mean weighted CE over non-ignored pixels.

    Args:
      logits:  [..., C] unnormalized class scores (any leading dims).
      targets: [...] int labels; entries == ignore_index contribute nothing.
      class_weights: [C] per-class weights or None.
    """
    num_classes = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    mask = targets != ignore_index
    safe_t = jnp.where(mask, targets, 0).astype(jnp.int32)
    nll = -jnp.take_along_axis(log_probs, safe_t[..., None], axis=-1)[..., 0]
    if class_weights is None:
        w = mask.astype(jnp.float32)
    else:
        cw = jnp.asarray(class_weights, dtype=jnp.float32)
        w = jnp.where(mask, cw[safe_t], 0.0)
    total_w = jnp.sum(w)
    return jnp.sum(nll * w) / jnp.maximum(total_w, 1e-12)


def _sample_weighted_mean(per_position: jnp.ndarray,
                          sample_weight: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean over [B, ...] values, weighting dim 0 by sample_weight [B].

    Used to exclude the duplicated padding samples of a final partial batch
    (data/pipeline.py) from losses that are not masked via labels.
    """
    if sample_weight is None:
        return jnp.mean(per_position)
    w = sample_weight.astype(jnp.float32)
    per_sample = jnp.mean(per_position.reshape(per_position.shape[0], -1),
                          axis=1)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1e-12)


def kd_logit_kl(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    temperature: float = 2.0,
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Hinton-style distillation KL: T^2 * KL(softmax(t/T) || softmax(s/T)).

    Mean over all spatial positions (optionally weighted per sample);
    computed in fp32 for stability.
    """
    T = temperature
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / T, axis=-1)
    t = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / T, axis=-1)
    p_t = jnp.exp(t)
    kl = jnp.sum(p_t * (t - s), axis=-1)
    return (T * T) * _sample_weighted_mean(kl, sample_weight)


def feature_matching_loss(
    student_feat: jnp.ndarray,
    teacher_feat: jnp.ndarray,
    projection: Optional[jnp.ndarray] = None,
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """MSE between student and (optionally linearly projected) teacher feature.

    Teacher channels generally exceed the student's (width_mult > 1), so a
    learned [Ct, Cs] projection maps teacher -> student space. On TPU the
    projection is a single [B*H*W, Ct] x [Ct, Cs] matmul that rides the MXU.
    """
    if projection is not None:
        # Operands stay in the tap's dtype (bf16 under ModelConfig.
        # compute_dtype=bf16) with f32 accumulation: TPU matmul default
        # precision truncates f32 operands to bf16 anyway, so an up-front
        # f32 cast buys no accuracy — it only materializes 2x-size tensors
        # (measured: the 3-tap feature match costs 1.5 ms of the benched
        # step, docs/kd_tail_v5e_b32.json). f32 taps (CPU tests, default
        # config) are bit-unchanged.
        t = jnp.einsum("...c,cd->...d", teacher_feat,
                       projection.astype(teacher_feat.dtype),
                       preferred_element_type=jnp.float32)
    else:
        t = teacher_feat.astype(jnp.float32)
    s = student_feat.astype(jnp.float32)
    return _sample_weighted_mean(jnp.square(s - t), sample_weight)


def kd_total_loss(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    student_feats: Mapping[str, jnp.ndarray],
    teacher_feats: Mapping[str, jnp.ndarray],
    targets: jnp.ndarray,
    *,
    class_weights: Optional[jnp.ndarray],
    ignore_index: int,
    temperature: float,
    alpha_kl: float,
    beta_feature: float,
    feature_taps: Sequence[str],
    projections: Optional[Mapping[str, jnp.ndarray]] = None,
    sample_weight: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """CE + alpha*KL + beta*mean(feature MSE). Returns (loss, parts).

    sample_weight [B] excludes padding samples (CE excludes them via
    ignore_index labels already).
    """
    ce = weighted_cross_entropy(student_logits, targets, class_weights,
                                ignore_index)
    # A statically-zero coefficient skips its term entirely: XLA cannot DCE
    # `0 * kl` (0 * NaN semantics), so without this a CE-only ablation would
    # still pay the full KL/feature-matching compute and HBM traffic.
    if isinstance(alpha_kl, (int, float)) and alpha_kl == 0.0:
        kl = jnp.zeros((), jnp.float32)
    else:
        kl = kd_logit_kl(student_logits, teacher_logits, temperature,
                         sample_weight)
    if isinstance(beta_feature, (int, float)) and beta_feature == 0.0:
        feature_taps = ()
    if feature_taps:
        fms = []
        for tap in feature_taps:
            proj = projections.get(tap) if projections is not None else None
            fms.append(feature_matching_loss(student_feats[tap],
                                             teacher_feats[tap], proj,
                                             sample_weight))
        fm = jnp.mean(jnp.stack(fms))
    else:
        fm = jnp.zeros((), jnp.float32)
    loss = ce + alpha_kl * kl + beta_feature * fm
    return loss, {"ce": ce, "kl": kl, "feature_mse": fm, "total": loss}
