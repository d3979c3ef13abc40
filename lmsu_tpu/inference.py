"""Single-frame / batch inference — the serving path.

The reference's closest analog is the visualization script's eval loop
(visualize_predictions.py:11-81); BASELINE.md tracks its p50 frame latency.
Predictor wraps a trained model as one jitted forward with optional bf16
compute, accepting uint8 or float images.

    predictor = Predictor.from_checkpoint("checkpoints/run/best.ckpt", cfg)
    mask = predictor.predict_mask(image_u8, points)          # [H, W] int32
    logits = predictor(images, points)                       # batched
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lmsu_tpu.config import ModelConfig
from lmsu_tpu.models import create_model


class Predictor:
    def __init__(self, config: ModelConfig, variables: Dict[str, Any],
                 freeze_weights: bool = False):
        """freeze_weights=True closes the variables into the jitted
        programs as compile-time CONSTANTS instead of runtime arguments —
        the standard frozen-serving trade. XLA can then constant-fold the
        eval-mode BatchNorms (scale/bias from running stats) into the
        adjacent convolution weights (the fold of ops/ir_fused.py::fold_bn,
        done by the compiler), eliminating the BN ops from the executable.
        Measured on v5e (docs/DESIGN.md "Inference BN folding"): +6.9%
        at B=1 (1.69 -> 1.58 ms/fwd, above the ±2.5% variance band) and
        no change at B=32 (-0.9%) — the batched forward is
        HBM-activation-bound and the fold removes no activation bytes.
        A real but small single-frame serving win; default off because
        weights are pinned at compile time (no hot-swap).
        """
        self.config = config
        self.model = create_model(config)
        self.variables = jax.device_put(variables)
        # The sorted-input scatter kernel's contract is a *pipeline*
        # property; serving callers shouldn't have to know it. Sort
        # incoming points on host (native counting sort / numpy fallback)
        # before dispatch when the config selects that impl.
        self._sorter = None
        if config.lidar.scatter_impl == "sorted_pallas":
            from lmsu_tpu.data.rasterize import make_point_sorter
            self._sorter = make_point_sorter(config.lidar.grid_size,
                                             config.lidar.point_cloud_range)
        self._freeze_weights = freeze_weights
        self._build_forwards(freeze_weights)

    def _build_forwards(self, freeze_weights: bool) -> None:
        if freeze_weights:
            const_vars = self.variables
            self._forward = jax.jit(
                lambda v, i, p, pv: self.model.apply(
                    const_vars, i, p, train=False, point_valid=pv))
            self._predict = jax.jit(
                lambda v, i, p, pv: jnp.argmax(
                    self.model.apply(const_vars, i, p, train=False,
                                     point_valid=pv), axis=-1))
        else:
            self._forward = jax.jit(
                lambda v, i, p, pv: self.model.apply(v, i, p, train=False,
                                                     point_valid=pv))
            self._predict = jax.jit(
                lambda v, i, p, pv: jnp.argmax(
                    self.model.apply(v, i, p, train=False, point_valid=pv),
                    axis=-1))

    def quantize(self, calibration_batches) -> None:
        """Switch this Predictor to int8 (w8a8) serving.

        Runs an eval-mode calibration pass over `calibration_batches`
        (dicts with "image"/"points"[/"point_valid"], or (image, points[,
        point_valid]) tuples) recording per-layer activation ranges, then
        rebuilds the jitted forwards with the "quant_stats" collection in
        the variables — which flips the eligible 1x1 convolutions to the
        s8 x s8 -> s32 MXU path (ops/quant.py; models/layers.py ConvBNAct).
        A handful of batches covering typical inputs suffices (per-tensor
        absmax calibration). Subsequent export() bakes the quantized graph
        into the artifact.

        Measured on v5e and CLOSED as a speed lever (ops/quant.py
        docstring, docs/quant_eval_v5e.json): SLOWER than bf16 at every
        batch size on this memory-bound model. Opt in only for int8-
        deployment-contract reasons, not performance.
        """
        self.variables = calibrate_quant(self.model, self.variables,
                                         calibration_batches,
                                         sorter=self._maybe_sort)
        self._build_forwards(self._freeze_weights)

    @classmethod
    def from_checkpoint(cls, path: str, config: ModelConfig,
                        bf16: bool = False,
                        freeze_weights: bool = False) -> "Predictor":
        """Load a trainer checkpoint (plain or KD student layout)."""
        from lmsu_tpu.training.checkpoint import load_model_variables
        if bf16:
            config = dataclasses.replace(config, compute_dtype=jnp.bfloat16)
        return cls(config, load_model_variables(path),
                   freeze_weights=freeze_weights)

    @classmethod
    def from_torch_checkpoint(cls, path: str, config: ModelConfig
                              ) -> "Predictor":
        """Load a reference PyTorch .pth checkpoint directly."""
        from lmsu_tpu.utils.torch_compat import load_torch_checkpoint
        return cls(config, load_torch_checkpoint(path, config))

    def __call__(self, images, points,
                 point_valid=None) -> jnp.ndarray:
        """Batched logits [B, H, W, num_classes].

        Pass the pipeline's `point_valid` mask when the points were
        zero-padded (DataConfig.pad_points_are_valid=False, the default) so
        serving matches training: without it, pad points count as real
        returns at the BEV grid centre.
        """
        points, point_valid = self._maybe_sort(points, point_valid)
        pv = None if point_valid is None else jnp.asarray(point_valid)
        return self._forward(self.variables, jnp.asarray(images),
                             jnp.asarray(points), pv)

    def _maybe_sort(self, points, point_valid):
        if self._sorter is None:
            return points, point_valid
        pts = np.asarray(points)
        pv = None if point_valid is None else np.asarray(point_valid)
        batched = pts.ndim == 3
        rows = pts if batched else pts[None]
        pvs = pv if pv is None or batched else pv[None]
        out_p, out_v = [], []
        for i in range(rows.shape[0]):
            s = {"points": rows[i]}
            if pvs is not None:
                s["point_valid"] = pvs[i]
            s = self._sorter(s)
            out_p.append(s["points"])
            out_v.append(s.get("point_valid"))
        pts = np.stack(out_p)
        if not batched:
            pts = pts[0]
        if pv is None:
            return pts, None
        pv = np.stack(out_v)
        return pts, (pv if batched else pv[0])

    def predict_mask(self, image, points, point_valid=None) -> np.ndarray:
        """Single frame -> [H, W] int32 class mask."""
        points, point_valid = self._maybe_sort(points, point_valid)
        images = jnp.asarray(image)[None] if np.ndim(image) == 3 \
            else jnp.asarray(image)
        pts = jnp.asarray(points)[None] if np.ndim(points) == 2 \
            else jnp.asarray(points)
        pv = None
        if point_valid is not None:
            pv = jnp.asarray(point_valid)
            if pv.ndim == 1:
                pv = pv[None]
        return np.asarray(self._predict(self.variables, images, pts, pv))[0]

    # -- serving export (jax.export / StableHLO) ----------------------------

    def export(self, path: str, batch_size: int = 1,
               image_size: Optional[tuple] = None,
               num_points: int = 5000,
               with_point_valid: bool = True,
               platforms: Optional[tuple] = None) -> None:
        """Serialize the forward as a self-contained serving artifact.

        The trained weights are closed into the exported function as
        constants (the freeze_weights trade), so the artifact needs NO
        Python model code, flax, or checkpoint at load time — just
        `load_exported(path)` and jax. StableHLO serialization gives the
        versioning/compatibility guarantees of jax.export (the TPU-native
        analog of torchscript/ONNX export, which the reference lacks).

        platforms: lowering platforms tuple, e.g. ("tpu",) or
        ("cpu", "tpu") for a cross-platform artifact; default = the
        current backend.
        """
        from jax import export as jexport

        hw = image_size or (self.config.image_size
                            if hasattr(self.config, "image_size")
                            else (256, 256))
        const_vars = self.variables
        if with_point_valid:
            def fn(i, p, pv):
                return self.model.apply(const_vars, i, p, train=False,
                                        point_valid=pv)
            specs = (jax.ShapeDtypeStruct((batch_size, *hw, 3), jnp.float32),
                     jax.ShapeDtypeStruct((batch_size, num_points, 4),
                                          jnp.float32),
                     jax.ShapeDtypeStruct((batch_size, num_points),
                                          jnp.bool_))
        else:
            def fn(i, p):
                return self.model.apply(const_vars, i, p, train=False)
            specs = (jax.ShapeDtypeStruct((batch_size, *hw, 3), jnp.float32),
                     jax.ShapeDtypeStruct((batch_size, num_points, 4),
                                          jnp.float32))
        exp = jexport.export(jax.jit(fn),
                             platforms=platforms)(*specs)
        with open(path, "wb") as f:
            f.write(exp.serialize())


def calibrate_quant(model, variables, batches, sorter=None):
    """Record per-layer activation absmax for int8 serving (ops/quant.py).

    Runs eval-mode forwards with the "quant_stats" collection mutable —
    each eligible ConvBNAct creates/updates its running absmax — and
    returns `variables` with the accumulated collection merged in. Feeding
    the result to apply() serves the int8 path; omitting it serves the
    original graph (the params are untouched).
    """
    fwd = jax.jit(lambda v, i, p, pv: model.apply(
        v, i, p, train=False, point_valid=pv, mutable=["quant_stats"]))
    stats = None
    for batch in batches:
        if isinstance(batch, dict):
            img, pts = batch["image"], batch["points"]
            pv = batch.get("point_valid")
        else:
            img, pts = batch[0], batch[1]
            pv = batch[2] if len(batch) > 2 else None
        if sorter is not None:
            pts, pv = sorter(pts, pv)
        v = {k: x for k, x in variables.items() if k != "quant_stats"}
        if stats is not None:
            v["quant_stats"] = stats
        _, mut = fwd(v, jnp.asarray(img), jnp.asarray(pts),
                     None if pv is None else jnp.asarray(pv))
        stats = mut["quant_stats"]
    if stats is None:
        raise ValueError("calibrate_quant needs at least one batch")
    return {**{k: x for k, x in variables.items() if k != "quant_stats"},
            "quant_stats": jax.device_get(stats)}


def load_exported(path: str):
    """Load a Predictor.export() artifact; returns a callable.

    The callable takes (images, points[, point_valid]) exactly as exported
    and returns logits [B, H, W, num_classes]. No model code needed.
    """
    from jax import export as jexport
    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return jax.jit(exp.call)
