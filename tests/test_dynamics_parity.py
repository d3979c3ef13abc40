"""Training-DYNAMICS parity against the PyTorch reference Trainer.

tests/test_parity_torch.py pins single forward/gradient parity; this module
pins the *trajectory*: N=20 identical optimizer steps (5 epochs x 4 batches,
same init, same data order) through our Trainer and the imported reference
Trainer (/root/reference/src/training/trainer.py:55-61,77-113) must track in
loss, validation behavior, parameters, and final predictions. This is the
strongest parity axis available without the real dataset — it would catch
AdamW eps/bias-correction or decay-coupling differences, cosine-schedule
epoch stepping, BN-momentum/running-stat semantics, and weighted-CE
normalization drift that single-step parity cannot.

Shapes are reduced (64x64 images -> 16x16 logits, 16x16 BEV grid) purely for
CPU runtime; both models are the full reference architecture.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"
sys.path.insert(0, REFERENCE_ROOT)

try:
    from src.models.camera_encoder import TwinLiteEncoder as TorchTwinLite
    from src.models.fusion_module import \
        CompleteSegmentationModel as TorchComplete
    from src.models.lidar_encoder import LiDAREncoder as TorchLiDAR
    from src.training.trainer import Trainer as TorchTrainer
    HAVE_REFERENCE = True
except Exception:  # pragma: no cover
    HAVE_REFERENCE = False

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE,
                                reason="reference repo not importable")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402

from lmsu_tpu.config import (DataConfig, ExperimentConfig,  # noqa: E402
                             LidarEncoderConfig, ModelConfig, TrainConfig)
from lmsu_tpu.training import Trainer  # noqa: E402
from lmsu_tpu.utils.torch_compat import convert_torch_state_dict  # noqa: E402

# -- shared fixture: model pair + deterministic batches -----------------------

IMG, GRID, NPTS, B = 64, 16, 500, 8   # B divisible by the 8-device mesh
N_TRAIN, N_EPOCHS = 32, 5          # 4 steps/epoch x 5 epochs = 20 steps
LR, WD, ETA_MIN = 1e-3, 1e-3, 1e-5

# The reference's two published training presets: the default 2-class
# entry (train_fusion_ablation.py) and the quirky 3-class weighted entry
# (/root/reference/train_pandaset.py:116-136 — concat/256, class weights
# from its distribution analysis incl. the 33.09 lane weight).
PRESETS = {
    "2class_minimal": dict(num_classes=2, fusion_type="minimal",
                           fusion_out_channels=128,
                           class_weights=(0.4, 3.5)),
    "3class_weighted": dict(num_classes=3, fusion_type="concat",
                            fusion_out_channels=256,
                            class_weights=(0.39, 2.61, 33.09)),
}


def _build_torch_model(preset) -> "torch.nn.Module":
    torch.manual_seed(42)
    cam = TorchTwinLite(return_multiscale=True)
    lidar = TorchLiDAR(encoder_type="spatial", grid_size=(GRID, GRID),
                       use_vectorized=True)
    return TorchComplete(
        camera_encoder=cam, lidar_encoder=lidar,
        num_classes=preset["num_classes"],
        fusion_type=preset["fusion_type"],
        fusion_out_channels=preset["fusion_out_channels"],
        camera_fpn_stages=["stage3", "stage4", "stage5"],
        camera_fpn_channels=128, output_mode="same")


def _model_config(preset) -> ModelConfig:
    return ModelConfig(num_classes=preset["num_classes"],
                       fusion_type=preset["fusion_type"],
                       fusion_out_channels=preset["fusion_out_channels"],
                       lidar=LidarEncoderConfig(grid_size=(GRID, GRID)))


def _make_batches(n_batches: int, seed: int, label_hw: int,
                  num_classes: int = 2):
    """Deterministic batches shared by both trainers. ~3% ignored pixels
    exercises ignore_index; weighted classes exercise the weighted-mean CE
    normalization (trainer.py:55). For 3 classes the label marginals mimic
    the reference's skewed distribution (86/13/1%) so the 33.09 lane
    weight actually bites."""
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_batches):
        images = rng.uniform(0, 1, (B, IMG, IMG, 3)).astype(np.float32)
        pts = rng.normal(0, 20, (B, NPTS, 4)).astype(np.float32)
        pts[..., 2] = rng.uniform(-5, 3, (B, NPTS))
        pts[..., 3] = rng.uniform(0, 1, (B, NPTS))
        if num_classes == 3:
            seg = rng.choice(3, (B, label_hw, label_hw),
                             p=(0.8621, 0.1278, 0.0101)).astype(np.int64)
        else:
            seg = rng.integers(0, num_classes,
                               (B, label_hw, label_hw)).astype(np.int64)
        seg[rng.uniform(size=seg.shape) < 0.03] = -1
        batches.append({"image": images, "points": pts, "segmentation": seg})
    return batches


class _TorchLoader:
    """Minimal DataLoader stand-in for the reference Trainer (NCHW)."""

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        for b in self.batches:
            yield {
                "image": torch.tensor(b["image"].transpose(0, 3, 1, 2)),
                "points": torch.tensor(b["points"]),
                "segmentation": torch.tensor(b["segmentation"]),
            }


class _JaxLoader:
    """Batcher-compatible loader over the same fixed batches (NHWC)."""

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        for i, b in enumerate(self.batches):
            yield dict(
                b,
                sample_index=np.arange(i * B, (i + 1) * B, dtype=np.int32),
                sample_mask=np.ones(B, bool))


@pytest.fixture(scope="module", params=list(PRESETS))
def trajectories(request, tmp_path_factory):
    """Run both trainers for N_EPOCHS over identical data; collect per-epoch
    train/val losses, final params, and final predictions. Parameterized
    over both reference training presets (VERDICT r4 next #8)."""
    preset = PRESETS[request.param]
    tmp = tmp_path_factory.mktemp(f"dyn_{request.param}")
    train_batches = _make_batches(N_TRAIN // B, seed=101, label_hw=GRID,
                                  num_classes=preset["num_classes"])
    val_batches = _make_batches(2, seed=202, label_hw=GRID,
                                num_classes=preset["num_classes"])

    # ---- torch side: the actual reference Trainer -----------------------
    tmodel = _build_torch_model(preset)
    ttrainer = TorchTrainer(
        tmodel, _TorchLoader(train_batches), _TorchLoader(val_batches),
        device="cpu", lr=LR, weight_decay=WD,
        save_dir=str(tmp / "torch_run"),
        class_weights=preset["class_weights"],
        num_epochs=N_EPOCHS)
    t_hist = {"train_loss": [], "val_loss": [], "val_miou": []}
    for _ in range(N_EPOCHS):
        tr_loss, _ = ttrainer.train_epoch()
        va_loss, va_m = ttrainer.validate()
        ttrainer.scheduler.step()
        t_hist["train_loss"].append(tr_loss)
        t_hist["val_loss"].append(va_loss)
        t_hist["val_miou"].append(va_m["miou"])
    tmodel.eval()
    with torch.no_grad():
        tb = next(iter(_TorchLoader(val_batches)))
        t_final_logits = tmodel(tb["image"], tb["points"]) \
            .numpy().transpose(0, 2, 3, 1)

    # ---- jax side: our Trainer, seeded with the SAME init ----------------
    cfg = ExperimentConfig(
        model=_model_config(preset),
        data=DataConfig(dataset="synthetic", image_size=(IMG, IMG),
                        grid_size=(GRID, GRID), max_points=NPTS,
                        batch_size=B),
        train=TrainConfig(num_epochs=N_EPOCHS, lr=LR, weight_decay=WD,
                          eta_min=ETA_MIN,
                          class_weights=preset["class_weights"],
                          save_dir=str(tmp / "jax_run")))
    jtrainer = Trainer(cfg, _JaxLoader(train_batches),
                       _JaxLoader(val_batches))
    # Replace the random init with the converted torch init (weights AND
    # batch_stats), re-initializing the optimizer state to match.
    variables = convert_torch_state_dict(
        _build_torch_model(preset).state_dict(), cfg.model)
    from lmsu_tpu.parallel.mesh import replicate
    from lmsu_tpu.training.trainer import TrainState
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=jtrainer.tx.init(variables["params"]),
                       ema_params=None)
    jtrainer.state = replicate(state, jtrainer.mesh)
    j_hist = {"train_loss": [], "val_loss": [], "val_miou": []}
    for _ in range(N_EPOCHS):
        tr_loss, _ = jtrainer.train_epoch()
        va_loss, va_m = jtrainer.validate()
        j_hist["train_loss"].append(tr_loss)
        j_hist["val_loss"].append(va_loss)
        j_hist["val_miou"].append(va_m["miou"])
    # For prediction agreement run the model directly in eval mode.
    params = jax.device_get(jtrainer.state.params)
    stats = jax.device_get(jtrainer.state.batch_stats)
    j_final_logits = np.asarray(jtrainer.model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(val_batches[0]["image"]),
        jnp.asarray(val_batches[0]["points"]), train=False))

    t_params = {k: v.detach().numpy() for k, v in
                tmodel.state_dict().items()}
    return dict(t_hist=t_hist, j_hist=j_hist,
                t_logits=t_final_logits, j_logits=j_final_logits,
                t_params=t_params, j_params=params)


N_STEPS = N_EPOCHS * (N_TRAIN // B)


class TestTrainingDynamicsParity:
    def test_train_loss_trajectory(self, trajectories):
        """Per-epoch mean train loss tracks the reference across all 20
        optimizer steps. Tolerance grows with step count: fp32 forward noise
        (~5e-4 logits) flips ReLU masks and compounds through AdamW's
        sqrt(v) normalization, but any *semantic* divergence (wrong eps,
        wrong decay coupling, wrong LR stepping) produces relative errors
        orders of magnitude larger within a few epochs."""
        t = np.array(trajectories["t_hist"]["train_loss"])
        j = np.array(trajectories["j_hist"]["train_loss"])
        rel = np.abs(t - j) / np.abs(t)
        # epoch-indexed bound: 0.5% first epoch, up to 3% by epoch 5
        bounds = np.array([5e-3, 1e-2, 1.5e-2, 2e-2, 3e-2])
        assert (rel < bounds).all(), f"train-loss rel drift {rel}"

    def test_val_loss_trajectory(self, trajectories):
        """Validation (eval-mode BN: running stats) tracks too — pins the
        running-statistics update semantics (momentum 0.1, torch side)
        across 20 updates."""
        t = np.array(trajectories["t_hist"]["val_loss"])
        j = np.array(trajectories["j_hist"]["val_loss"])
        rel = np.abs(t - j) / np.abs(t)
        bounds = np.array([5e-3, 1e-2, 1.5e-2, 2e-2, 3e-2])
        assert (rel < bounds).all(), f"val-loss rel drift {rel}"

    def test_val_miou_trajectory(self, trajectories):
        t = np.array(trajectories["t_hist"]["val_miou"])
        j = np.array(trajectories["j_hist"]["val_miou"])
        assert np.abs(t - j).max() < 0.05, (t, j)

    def test_final_prediction_agreement(self, trajectories):
        """After 20 steps, eval-mode argmax agrees except where the torch
        top-2 margin is inside accumulated float drift — so the hard gate
        applies to DECISIVE pixels (top-2 logit margin > 0.1). The 3-class
        weighted preset's 33.09 lane weight pushes many pixels onto the
        1-vs-2 decision boundary (measured: 0.985 flat agreement vs 0.995+
        among decisive pixels); a semantic training bug would disagree on
        decisive pixels too."""
        t, j = trajectories["t_logits"], trajectories["j_logits"]
        t_pred, j_pred = t.argmax(-1), j.argmax(-1)
        agree = (t_pred == j_pred).mean()
        assert agree > 0.97, f"flat argmax agreement {agree:.4f}"
        top2 = np.sort(t, axis=-1)
        margin = top2[..., -1] - top2[..., -2]
        # Scale-free gate: the top-half-margin pixels (after only 20 steps
        # absolute logit margins are still small, so a fixed threshold
        # would under-cover).
        decisive = margin > np.median(margin)
        agree_d = (t_pred == j_pred)[decisive].mean()
        assert agree_d > 0.99, f"decisive-pixel agreement {agree_d:.4f}"

    def test_final_parameter_drift(self, trajectories):
        """Relative L2 drift of trained tensors stays small after 20 AdamW
        steps — catches any per-step bias (wrong eps, decay coupling,
        schedule) that accumulates linearly."""
        checks = [
            # ReLU mask-flip noise compounds with backprop depth (see
            # test_parity_torch.py's per-tensor bounds): the stem is the
            # deepest tensor (measured ~2.2e-2 after 20 steps), shallow
            # tensors sit well under 2e-2. A semantic AdamW/schedule bug
            # drifts at the 1e-1..1 level within 20 steps.
            ("camera_encoder.stem.0.weight",
             lambda w: w.transpose(2, 3, 1, 0),
             ("camera_encoder", "stem", "conv", "kernel"), 4e-2),
            ("head.cls.weight",
             lambda w: w.transpose(2, 3, 1, 0),
             ("head", "cls", "kernel"), 2e-2),
            ("lidar_encoder.encoder.point_mlp.0.weight",
             lambda w: w[:, :, 0].T,
             ("lidar_encoder", "encoder", "mlp0", "kernel"), 2e-2),
        ]
        for tname, tf, jpath, bound in checks:
            tw = tf(trajectories["t_params"][tname])
            jw = trajectories["j_params"]
            for k in jpath:
                jw = jw[k]
            jw = np.asarray(jw)
            rel = np.linalg.norm(jw - tw) / max(np.linalg.norm(tw), 1e-8)
            assert rel < bound, f"{tname}: post-training rel L2 {rel:.2e}"
