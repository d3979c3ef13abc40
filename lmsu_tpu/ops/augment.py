"""Device-side training-data augmentation, traced into the jitted train step.

The reference trains on raw samples only (its Dataset has no transform hook
— reference: pandaset_dataset.py:104-141), so this subsystem has no analog
to port; it is designed TPU-first instead:

  * everything is fixed-shape and branch-free — per-sample gating is a
    `where` select, never a Python branch, so one executable serves all
    randomness outcomes;
  * randomness is `jax.random` keyed by `fold_in(seed, state.step)`: the
    per-batch (trainer), scan_steps, and onchip_epoch loops all call the
    same step function, so all three augment identically, and resume at
    step k reproduces the augmentation stream exactly;
  * augmentation rides the step's XLA program: the elementwise image terms
    fuse into the normalize/cast epilogue that already runs on device, so
    the host pipeline (and the teacher-cache fill, which must see CLEAN
    inputs) is untouched.

Geometric exactness — why the flip is not a naive ``[..., ::-1]``
-----------------------------------------------------------------
The BEV rasterizer maps coordinates to cells with floor(norm * (W-1))
(reference: pandaset_dataset.py:33-41; device twin ops/scatter.py:62-63).
That mapping is NOT symmetric under reflection: mirroring x about the range
center sends continuous position f = norm*(W-1) to (W-1) - f, hence cell
c = floor(f) to cell W-2-c (not W-1-c) for every non-boundary point. A
naive label-grid reverse would therefore misalign LiDAR evidence from
labels by one full cell (1.56 m at the default 64x64/±50 m grid) on every
flipped sample — a systematic blur on par with the hard benchmark's road
widths. The exact transform used here:

  * points:   x' = (x_min + x_max) - x            (true world mirror)
  * labels:   new[c] = old[W-2-c] for c < W-1;  old[W-1] (reachable only by
              points at exactly x = x_max) max-merges into new[0]; the
              vacated new[W-1] (reachable only from exactly x = x_min)
              becomes ignore_index — no pixel gains or loses signal;
  * image:    "aligned" mode mirrors then shifts one BEV cell so image
              content tracks the W-2-c cell mapping (exact when image
              columns tile BEV columns, as in the synthetic top-down
              render — data/synthetic.py:141); the vacated right edge
              replicates the edge column, and its label column is ignored.
              "mirror" mode is a plain mirror for perspective cameras.

Padded samples (segmentation all ignore_index, sample_mask 0) are
flip-invariant by construction: the label transform maps all-ignore to
all-ignore, so no per-sample mask gating is needed.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from lmsu_tpu.config import AugmentConfig


def flip_bev_labels(seg: jnp.ndarray, ignore_index: int = -1) -> jnp.ndarray:
    """Exact label-grid mirror matching the point mirror x' = xm - x.

    seg: [..., H, W] integer labels. Returns the same shape. See module
    docstring for the cell mapping (c -> W-2-c, boundary columns handled
    exactly). Multi-class note: the old last column merges into the new
    first by `maximum` — for the binary labels of record this is exactly
    "any drivable point wins"; for >2 classes it prefers the higher class
    id in that single boundary column.
    """
    W = seg.shape[-1]
    body = seg[..., : W - 1][..., ::-1]  # new col c = old col W-2-c
    first = jnp.maximum(body[..., :1], seg[..., W - 1:])
    vacated = jnp.full_like(seg[..., :1], ignore_index)
    return jnp.concatenate([first, body[..., 1:], vacated], axis=-1)


def flip_image(image: jnp.ndarray, mode: str, grid_w: int) -> jnp.ndarray:
    """Mirror an NHWC image along width.

    mode="aligned": mirror then shift left by one BEV cell's worth of
    pixels (round(iw / grid_w)) so a top-down-aligned image tracks the
    label/point cell mapping c -> W-2-c; the vacated right edge replicates
    the last column (its BEV column is label-ignored). mode="mirror":
    plain mirror.
    """
    m = image[..., ::-1, :]  # width is axis -2 in NHWC
    if mode == "mirror":
        return m
    if mode != "aligned":
        raise ValueError(f"flip_image_mode must be 'aligned' or 'mirror', "
                         f"got {mode!r}")
    iw = image.shape[-2]
    s = max(1, round(iw / grid_w))
    edge = jnp.repeat(m[..., -1:, :], s, axis=-2)
    return jnp.concatenate([m[..., s:, :], edge], axis=-2)


def _to_float_image(image: jnp.ndarray) -> jnp.ndarray:
    """uint8 transport images -> float32 in [0, 1] (the model accepts both;
    models/fusion.py normalizes uint8 on device the same way)."""
    if image.dtype == jnp.uint8:
        return image.astype(jnp.float32) / 255.0
    return image


def augment_batch(rng: jax.Array, batch: Dict[str, jnp.ndarray],
                  cfg: AugmentConfig, *,
                  pc_range: Tuple[float, float, float, float],
                  ignore_index: int = -1) -> Dict[str, jnp.ndarray]:
    """Apply the configured augmentations to one training batch.

    Pure and jit-traceable; returns a new batch dict (inputs untouched).
    `pc_range` is (x_min, x_max, y_min, y_max) — DataConfig.pc_range order.
    The image is returned as float32 in [0, 1] whenever any image term is
    active (including flip), else passed through unchanged.
    """
    out = dict(batch)
    B = batch["points"].shape[0]
    k_flip, k_bri, k_con, k_noise, k_drop, k_jit = jax.random.split(rng, 6)

    image = batch["image"]
    any_image_term = (cfg.hflip_prob > 0 or cfg.brightness > 0
                      or cfg.contrast > 0 or cfg.image_noise_std > 0)
    if any_image_term:
        image = _to_float_image(image)

    # -- photometric (image only; labels/points untouched) -------------------
    if cfg.brightness > 0:
        delta = jax.random.uniform(k_bri, (B, 1, 1, 1),
                                   minval=-cfg.brightness,
                                   maxval=cfg.brightness)
        image = image + delta
    if cfg.contrast > 0:
        logs = jax.random.uniform(k_con, (B, 1, 1, 1),
                                  minval=-cfg.contrast, maxval=cfg.contrast)
        mean = jnp.mean(image, axis=(1, 2), keepdims=True)  # per-sample/chan
        image = mean + (image - mean) * jnp.exp(logs)
    if cfg.image_noise_std > 0:
        image = image + cfg.image_noise_std * jax.random.normal(
            k_noise, image.shape, image.dtype)
    if cfg.brightness > 0 or cfg.contrast > 0 or cfg.image_noise_std > 0:
        image = jnp.clip(image, 0.0, 1.0)

    points = batch["points"]

    # -- geometric: lateral world mirror -------------------------------------
    if cfg.hflip_prob > 0:
        flip = jax.random.bernoulli(k_flip, cfg.hflip_prob, (B,))
        x_min, x_max = float(pc_range[0]), float(pc_range[1])
        grid_w = batch["segmentation"].shape[-1]
        points = jnp.asarray(points)  # accept host numpy batches too
        mirrored_x = (x_min + x_max) - points[..., 0]
        points = points.at[..., 0].set(
            jnp.where(flip[:, None], mirrored_x, points[..., 0]))
        image = jnp.where(flip[:, None, None, None],
                          flip_image(image, cfg.flip_image_mode, grid_w),
                          image)
        seg = batch["segmentation"]
        out["segmentation"] = jnp.where(
            flip[:, None, None], flip_bev_labels(seg, ignore_index), seg)

    # -- point-cloud terms ----------------------------------------------------
    if cfg.point_dropout > 0:
        keep = jax.random.uniform(k_drop, points.shape[:2]) >= cfg.point_dropout
        prior = batch.get("point_valid")
        out["point_valid"] = keep if prior is None else (prior & keep)
    if cfg.point_jitter_xy > 0 or cfg.point_jitter_z > 0 \
            or cfg.intensity_jitter > 0:
        std = jnp.asarray([cfg.point_jitter_xy, cfg.point_jitter_xy,
                           cfg.point_jitter_z, cfg.intensity_jitter],
                          points.dtype)
        points = points + std * jax.random.normal(k_jit, points.shape,
                                                  points.dtype)

    out["image"] = image
    out["points"] = points
    return out


def check_augment_compat(aug: AugmentConfig, scatter_impl: str,
                         cache_teacher: bool = False) -> None:
    """Fail loudly at trainer-build time on invalid combinations
    (see AugmentConfig docstring for the rules)."""
    if not aug.enabled:
        return
    if aug.moves_points and scatter_impl == "sorted_pallas":
        raise ValueError(
            "augmentation terms that move or drop points (hflip_prob, "
            "point_dropout, point_jitter_xy) break the pre-sorted input "
            "contract of scatter_impl='sorted_pallas' (the host sorts "
            "points by BEV cell BEFORE the step runs). Use scatter_impl="
            "'xla' for augmented training, or restrict augmentation to "
            "photometric / z / intensity terms.")
    if aug.spatial and cache_teacher:
        raise ValueError(
            "hflip_prob > 0 is incompatible with KDConfig.cache_teacher: "
            "cached teacher taps are spatial maps of the unflipped world. "
            "Disable the cache (in-loop teacher sees the flipped batch) or "
            "drop the flip; photometric terms and point dropout/z-jitter "
            "DO compose with the cache as noisy-student KD.")
