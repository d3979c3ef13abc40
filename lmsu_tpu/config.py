"""Configuration layer for the TPU-native multi-modal scene-understanding framework.

The reference repo has *no* config system: every hyperparameter is a hard-coded
literal in its entry scripts (reference: train_pandaset.py:79-163,
train_with_fusion_ablation.py:10-66).  This module promotes those literals to
typed dataclasses with the reference values as defaults, per SURVEY.md §5.

Defaults of record (reference file:line):
  lr 1e-3, weight_decay 1e-3            trainer.py:42
  batch 4, cosine eta_min 1e-5          trainer.py:59-61
  image 256x256                         pandaset_dataset.py:56
  BEV grid 64x64, pc_range +-50 m       pandaset_dataset.py:57,66
  max_points 5000                       pandaset_dataset.py:58
  lidar pc range [-50,-50,-5,50,50,3]   lidar_encoder.py:12
  class weights [0.4, 3.5] (2-class)    train_with_fusion_ablation.py:47
  class weights [0.39,2.61,33.09] (3c)  train_pandaset.py:136
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class CameraEncoderConfig:
    """TwinLite-style lightweight CNN (reference: camera_encoder.py:56-123)."""

    in_channels: int = 3
    base_channels: int = 32
    return_multiscale: bool = True
    # Width multiplier lets the same definition serve as a larger KD teacher.
    width_mult: float = 1.0
    # Rematerialize stages in the backward pass: trades (cheap, low-MXU-
    # utilization) recompute for HBM traffic of the 6x-expanded 128^2/64^2
    # activations — the measured bottleneck of the training step.
    remat: bool = False
    # Eval-mode (train=False) forwards run each InvertedResidual stage as
    # ONE fused Pallas kernel (ops/ir_fused.py): BN running stats fold to
    # scale/bias and the 6x-expanded hidden activations never leave VMEM.
    # Measured SLOWER than XLA at the bench shape (docs/DESIGN.md closure);
    # shipped as the documented record. Like every Pallas opt-in here,
    # single-chip scope: GSPMD has no partitioning rule for Mosaic custom
    # calls, so do not enable under a >1-device sharded step.
    fused_inference: bool = False
    # Train-mode forwards + backwards run through the fused custom-VJP
    # Pallas kernels (ops/ir_fused.py): 3 forward passes + 3 backward
    # passes per stage instead of XLA's per-ConvBNAct materialization —
    # the expanded tensors touch HBM once (the stored depthwise output)
    # instead of ~6 times. BN running averages update identically to the
    # unfused path. Measured SLOWER than XLA (docs/DESIGN.md closure);
    # single-chip scope, as above.
    fused_train: bool = False

    @property
    def channels(self) -> Tuple[int, int, int]:
        b = int(round(self.base_channels * self.width_mult))
        return (b, b * 2, b * 4)


@dataclass(frozen=True)
class LidarEncoderConfig:
    """PointNet-style BEV encoder (reference: lidar_encoder.py:9-41)."""

    encoder_type: str = "spatial"  # "spatial" | "pointpillars"
    input_dim: int = 4
    feature_dim: int = 128
    grid_size: Tuple[int, int] = (64, 64)
    point_cloud_range: Tuple[float, float, float, float, float, float] = (
        -50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
    mlp_dims: Tuple[int, ...] = (64, 128)
    # BEV scatter-max algorithm: "xla" (scatter HLO, autodiff backward),
    # "xla_fastbwd" (same forward, hand-written 3-pass backward — faster
    # isolated, slower in the full KD step; docs/DESIGN.md), "sorted"
    # (sort + segmented prefix-max + gather — no scatter op at all; see
    # ops/scatter.py::bev_scatter_max_sorted), or "pallas" (VMEM-resident
    # kernel, ops/voxelize_pallas.py — mesh-compatible: a
    # custom_partitioning rule shards the batch dim, so it runs per-shard
    # under a >1-device data-sharded step), or "sorted_pallas"
    # (ops/scatter_sorted_pallas.py — segmented roll-max scan + one-hot MXU
    # placement matmuls, no row-serial ops in either direction;
    # mesh-compatible; REQUIRES points pre-sorted by BEV cell, which the
    # pipeline provides via data/rasterize.py::make_point_sorter /
    # the loaders' sample_transform hook). Pick per measurement;
    # equivalence of all five is pinned by tests.
    scatter_impl: str = "xla"
    # Deprecated alias: use_pallas=True == scatter_impl="pallas".
    use_pallas: bool = False
    width_mult: float = 1.0


@dataclass(frozen=True)
class ModelConfig:
    """Complete fusion segmentation model (reference: fusion_module.py:179-232)."""

    num_classes: int = 2
    fusion_type: str = "concat"  # "concat" | "minimal" | "weighted"
    #   | "gated_sum" (non-convex sigmoid gates; no reference analog —
    #     designed from the weighted-gate ablation, docs/DESIGN.md)
    fusion_out_channels: int = 256
    camera_fpn_channels: int = 128
    # The reference experiments of record all select these three stages
    # (train_pandaset.py:120, train_with_fusion_ablation.py:36); None = all.
    camera_fpn_stages: Optional[Tuple[str, ...]] = ("stage3", "stage4", "stage5")
    output_mode: str = "same"  # "same" | "x4"
    # Route the weighted-fusion gate through the fused Pallas kernel
    # (ops/fusion_pallas.py) instead of the XLA ops. Mesh-compatible: a
    # custom_partitioning batch rule runs the kernel per-shard under a
    # data-sharded step (tests/test_pallas.py::TestFusionGateOnMesh).
    use_pallas_fusion: bool = False
    camera: CameraEncoderConfig = field(default_factory=CameraEncoderConfig)
    lidar: LidarEncoderConfig = field(default_factory=LidarEncoderConfig)
    # Compute dtype: bf16 rides the MXU at full rate on TPU; params stay fp32.
    compute_dtype: Any = jnp.float32

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


def teacher_config(student: ModelConfig, width_mult: float = 2.0) -> ModelConfig:
    """A wider variant of the student used as the KD teacher.

    The reference repo names itself "knowledge distillation" but contains no
    teacher (SURVEY.md §0); the north star asks for a teacher->student KD loss.
    We scale the student's width — the standard KD setup for this model family.
    """
    return student.replace(
        camera=dataclasses.replace(student.camera, width_mult=width_mult),
        lidar=dataclasses.replace(
            student.lidar,
            feature_dim=int(student.lidar.feature_dim * width_mult),
            mlp_dims=tuple(int(d * width_mult) for d in student.lidar.mlp_dims),
            width_mult=width_mult,
        ),
        camera_fpn_channels=int(student.camera_fpn_channels * width_mult),
        fusion_out_channels=int(student.fusion_out_channels * width_mult),
    )


@dataclass(frozen=True)
class DataConfig:
    """Dataset + host input pipeline (reference: pandaset_dataset.py:48-157)."""

    root: str = "data/pandaset"
    dataset: str = "synthetic"  # "pandaset" | "synthetic" | "packed"
    #   "packed": pre-decoded memmapped arrays written once by
    #   scripts/prepare_dataset.py (data/packed.py); `root` is the pack
    #   directory (with train/ and val/ subpacks). Decode cost at train
    #   time is ~zero — the PandaSet-scale feeding path for hosts whose
    #   JPEG decode cannot keep up with the device step (BASELINE.md
    #   input-pipeline table).
    # (H, W) everywhere in this framework. NOTE: the reference passes its
    # image_size tuple straight to PIL.resize, i.e. interprets it as (W, H)
    # (pandaset_dataset.py:110) — identical at the default square 256x256,
    # deliberately different for non-square sizes (H, W matches the NHWC
    # array layout the rest of the pipeline uses).
    image_size: Tuple[int, int] = (256, 256)
    grid_size: Tuple[int, int] = (64, 64)
    max_points: int = 5000
    pc_range: Tuple[float, float, float, float] = (-50.0, 50.0, -50.0, 50.0)
    batch_size: int = 4
    shuffle_train: bool = True
    # Parallel per-sample decode threads (reference: DataLoader
    # num_workers=2, train_pandaset.py:97). 0/1 = decode inline on the
    # prefetch producer thread.
    num_workers: int = 2
    train_fraction: float = 0.8
    # Synthetic dataset (hermetic fixture; reference §2.26 deleted component).
    synthetic_num_train: int = 800
    synthetic_num_val: int = 200
    # "easy" = the original saturating smoke fixture; "hard" = the
    # discriminative benchmark (thin roads, vehicles, modality-ambiguous
    # distractor lots, sensor degradations — see data/synthetic.py).
    synthetic_difficulty: str = "easy"
    # Reference quirk (pandaset_dataset.py:124-126): zero-padded points pass the
    # validity mask and land at the grid centre. Kept for parity, off by default
    # here because padded points are tagged invalid in the TPU pipeline.
    pad_points_are_valid: bool = False
    # PandaSet decoded-sample RAM cache (~0.3 MB/sample; ~0.6 GB at the
    # reference's 1,920-frame scale): epoch 1 decodes once, epoch 2+ reads
    # host RAM — the chip stops stalling on JPEG decode after the first
    # epoch. Sound because per-sample decode is deterministic (see
    # data/pandaset.py). For zero stall from epoch 1, pre-decode with
    # scripts/prepare_dataset.py and use dataset="packed" instead.
    decoded_cache: bool = False


@dataclass(frozen=True)
class AugmentConfig:
    """Device-side, jitted training-data augmentation (no reference analog:
    the reference trains on raw samples only). All terms run INSIDE the
    jitted train step (ops/augment.py) — fixed shapes, per-(step, sample)
    randomness derived from `fold_in(seed, state.step)`, so every epoch-loop
    variant (per-batch, scan_steps, onchip_epoch) augments identically and
    resume is deterministic. Validation is never augmented.

    Geometric: `hflip_prob` mirrors the world laterally (x -> x_min+x_max-x)
    consistently across ALL modalities — image width axis, point x, and the
    BEV label grid. The rasterizer's floor(norm*(W-1)) cell mapping is NOT
    symmetric under reflection (cell c maps to W-2-c, not W-1-c), so the
    label flip uses the exact transform (ops/augment.py::flip_bev_labels)
    and the aligned image flip shifts by one BEV cell to match; the vacated
    last label column becomes ignore_index. A naive all-axes `[::-1]` flip
    would misalign LiDAR evidence from labels by a full cell (1.56 m) on
    every flipped sample.

    Compatibility rules (enforced by the trainers):
      * terms that move/drop points (hflip, point_dropout, point_jitter_xy)
        break the pre-sorted input contract of scatter_impl="sorted_pallas";
      * hflip breaks KDConfig.cache_teacher (cached teacher taps are
        spatial maps of the UNflipped world). Photometric terms and point
        dropout/z-jitter compose with the cached teacher as noisy-student
        KD (teacher targets from clean inputs, student sees augmented ones).
    """

    enabled: bool = False
    # Lateral world mirror, applied per sample with this probability.
    hflip_prob: float = 0.0
    # "aligned": mirror + one-BEV-cell shift — exact for top-down renders
    # whose image columns tile BEV columns (the synthetic datasets).
    # "mirror": plain mirror — for perspective cameras (PandaSet front cam),
    # where no exact pixel<->cell correspondence exists anyway.
    flip_image_mode: str = "aligned"
    brightness: float = 0.0        # per-sample additive delta ~ U(-b, b)
    contrast: float = 0.0          # per-sample scale ~ exp(U(-c, c)) about the mean
    image_noise_std: float = 0.0   # per-pixel gaussian noise
    point_dropout: float = 0.0     # per-point drop probability
    point_jitter_xy: float = 0.0   # gaussian std on x/y (meters)
    point_jitter_z: float = 0.0    # gaussian std on z (meters)
    intensity_jitter: float = 0.0  # gaussian std on intensity
    seed_offset: int = 0x5EED      # decorrelates augment rng from init rng

    @property
    def moves_points(self) -> bool:
        """True if any term changes point cell assignment or validity —
        incompatible with the sorted_pallas input contract."""
        return (self.hflip_prob > 0 or self.point_dropout > 0
                or self.point_jitter_xy > 0)

    @property
    def spatial(self) -> bool:
        """True if any term moves scene geometry — incompatible with
        cached-teacher KD (spatially-mapped taps)."""
        return self.hflip_prob > 0


@dataclass(frozen=True)
class KDConfig:
    """Teacher->student distillation loss (north star; no reference analog).

    Feature taps follow the intermediates contract of the reference forward
    (fusion_module.py:260-262): camera_feat / lidar_feat / pre_fusion /
    post_fusion / logits.
    """

    enabled: bool = False
    temperature: float = 2.0
    alpha_kl: float = 0.5          # weight on the logit-KL term
    beta_feature: float = 0.5      # weight on the feature-matching term
    # Default taps deliberately omit pre_fusion (the contract's 4th tap):
    # it is redundant with the taps already matched — for concat fusion
    # pre_fusion is literally concat(camera_feat, lidar_feat), and for
    # minimal/weighted it aliases the camera-path tensor (models/fusion.py)
    # — so matching it would double-count those features (and double their
    # HBM traffic in the cached-teacher path) without adding signal. Opt in
    # per-run via feature_taps if an experiment wants it.
    feature_taps: Tuple[str, ...] = ("camera_feat", "lidar_feat", "post_fusion")
    teacher_width_mult: float = 2.0
    teacher_checkpoint: Optional[str] = None
    # Deep-ensemble teacher: >1 same-config members (independently trained;
    # different init/data-order seeds). The ensemble presents as ONE teacher
    # — member-averaged logits and feature taps (training/distill.py
    # EnsembleTeacher) — so every KD path (in-loop, cached/spilled, scans,
    # tp/sp partitioning) works unchanged. Members come from
    # teacher_checkpoints when set (overrides teacher_checkpoint), else
    # ensemble_size randomly-initialized members (tests/benches).
    teacher_checkpoints: Optional[Tuple[str, ...]] = None
    ensemble_size: int = 1
    # Fused Pallas KD-loss kernel on TPU. Mesh-compatible: the feature-MSE
    # kernel computes per-sample partials under a custom_partitioning
    # batch rule; the cross-sample reduction is XLA's (ops/kd_loss_pallas).
    use_pallas: bool = False
    # Precompute the frozen teacher's logits + feature taps once over the
    # training set, gathered per step by sample index — removes the teacher
    # forward from the steady-state step. Valid because the pipeline has no
    # augmentation and per-sample point downsampling is deterministic in
    # (dataset seed, sample index), so teacher inputs are constant per
    # sample across epochs. Memory: ~8 MB/sample bf16 at default taps/
    # widths; caches that exceed KDConfig.cache_hbm_limit_bytes spill to
    # host RAM and are gathered+transferred per step (see training/distill).
    cache_teacher: bool = False
    # HBM budget for the device-resident cache. Above this the cache lives
    # in host RAM (numpy), per-step slices are device_put asynchronously.
    cache_hbm_limit_bytes: int = 4 << 30
    # Storage dtype of the cached teacher outputs: "auto" follows the
    # model's compute dtype (fp32 cache for fp32 training), "bfloat16"
    # forces a half-size cache. bf16 rounds the frozen targets once at
    # fill time (~3 significant digits — negligible against the KD loss
    # terms) and halves both the HBM footprint and any host-spill
    # transfer; it is what lets a 4x-wide teacher's cache coexist with
    # the student step on one 16 GB chip (the fp32 cache at that width
    # measured 2.77 GB over HBM capacity).
    cache_dtype: str = "auto"
    # How the frozen teacher is partitioned over the mesh (parallel/tp.py):
    #   "tp" — tensor parallelism: every conv/dense kernel channel-sharded
    #          over the 'model' axis, activations inherit the sharding,
    #          GSPMD inserts the all-gathers. Fits teachers wider than one
    #          chip's HBM. Needs MeshConfig.model_parallel > 1.
    #   "sp" — spatial partitioning: teacher weights replicated, the input
    #          image (and thus every conv activation) sharded on H over the
    #          'model' axis; GSPMD inserts the halo exchanges. Fits higher-
    #          resolution teachers whose ACTIVATIONS dominate memory. Needs
    #          MeshConfig.model_parallel > 1.
    #   "fsdp" — ZeRO-3-style storage sharding: every teacher weight leaf's
    #          largest divisible dim is sharded over the DATA axis and GSPMD
    #          all-gathers each weight just before use. Compute stays full-
    #          width per device (no narrow-layer inefficiency) and no model
    #          axis is needed — parameter memory scales down with plain data
    #          parallelism. The right choice when weights (not activations)
    #          are what doesn't fit and model_parallel is unwanted.
    # Either way the student stays pure data-parallel.
    teacher_partition: str = "tp"


@dataclass(frozen=True)
class TrainConfig:
    """Optimization + loop (reference: trainer.py:40-74)."""

    lr: float = 1e-3
    weight_decay: float = 1e-3
    num_epochs: int = 20
    eta_min: float = 1e-5
    # Clip gradients to this global L2 norm before AdamW (None = off; the
    # reference never clips). Applied to the whole grad pytree, including
    # KD projection grads under distillation.
    grad_clip_norm: Optional[float] = None
    # Exponential moving average of the trainable params, updated on-chip
    # each step: ema = d*ema + (1-d)*params. When set, validation, best-
    # checkpoint selection, and inference-side loading
    # (checkpoint.load_model_variables) all use the EMA weights; BatchNorm
    # running stats are already an EMA and are shared. None = off.
    ema_decay: Optional[float] = None
    class_weights: Optional[Tuple[float, ...]] = (0.4, 3.5)
    ignore_index: int = -1
    save_dir: str = "checkpoints/run"
    # Every N epochs additionally write an immutable epoch_###.ckpt next
    # to latest/best (same sync/async path). Historical snapshots feed
    # post-hoc analysis and snapshot-ensemble teachers — the "ensembles
    # are free when the snapshots already exist" case from the
    # EnsembleTeacher closure (pass them as KDConfig.teacher_checkpoints).
    # None = off (reference keeps only latest/best, trainer.py:116-142).
    snapshot_every: Optional[int] = None
    # Install a SIGTERM handler for the duration of train() that requests
    # a graceful stop (Trainer.request_preempt): the loop finishes the
    # current epoch, records it, writes + flushes its checkpoint, and
    # returns — so an evicted preemptible slice leaves a consistent
    # latest.ckpt to resume from instead of a killed process. Off by
    # default (library code shouldn't take over signals unasked).
    handle_sigterm: bool = False
    # Write checkpoints from a background thread (checkpoint.py
    # AsyncCheckpointer): the epoch loop snapshots the state with an
    # on-device copy and moves on; D2H transfer, serialization and disk IO
    # overlap the next epoch's compute. Same files, same latest/best
    # semantics; the trainer flushes the queue at the end of train() and
    # before any resume load.
    async_checkpoint: bool = False
    seed: int = 0
    log_every: int = 10
    metrics_num_classes: int = 2   # reference quirk: hard-coded 2 (trainer.py:78)
    # Enable jax_debug_nans + jax_debug_infs: any NaN/Inf produced inside
    # the jitted step raises at the originating op (SURVEY.md §5: the
    # TPU-native stand-in for sanitizers the reference lacks). NOTE: these
    # are process-global JAX flags — once a Trainer enables them they stay
    # on for the rest of the process.
    debug_nans: bool = False
    # Chain this many steps in one lax.scan dispatch (1 = off), for BOTH
    # training and validation epochs. Stacks K host batches into [K, B, ...]
    # arrays; amortizes per-step dispatch latency (the whole inner loop runs
    # on-chip). Same math as per-batch stepping, but not bitwise identical:
    # XLA fusion order changes fp32 rounding, which Adam can amplify to
    # ~lr-sized parameter differences on near-zero gradients (see
    # tests/test_trainer.py).
    scan_steps: int = 1
    # Run each training epoch as ONE on-chip lax.scan over an HBM-resident
    # copy of the train set (shuffled by a per-epoch permutation): zero host
    # dispatch/input work in the steady state. Requires the materialized
    # dataset to fit in HBM next to model+optimizer (synthetic: ~0.3 MB per
    # 256^2 sample). Same step math as the host-driven path; the padded
    # tail rows are -1-masked exactly like the Batcher's.
    onchip_epoch: bool = False
    # Validation analog of onchip_epoch: run each validation pass as ONE
    # on-chip lax.scan over an HBM-resident copy of the val set. None =
    # follow onchip_epoch when the val loader supports it (Batcher-based,
    # single-process), silently falling back to the host path otherwise;
    # True = require it (raise when unsupported); False = never. Motivated
    # by measurement (docs/onchip_cached_v5e.json context): with 592 ms
    # on-chip train epochs, per-batch validation re-transferring the val
    # set every epoch over a slow host link dominated the epoch loop.
    onchip_eval: Optional[bool] = None
    # Contiguous on-chip epoch body: pre-permute the HBM-resident dataset
    # (and the KD teacher cache) ONCE per epoch with a whole-array gather,
    # then the epoch-scan body reads contiguous dynamic slices instead of
    # per-step jnp.take gathers (VERDICT r4 weak #1: the per-step gathers
    # cost ~18 ms/step at B=32 on v5e). Same math — the same rows reach the
    # same steps — but not bitwise (gather/slice change nothing; the
    # cached-teacher rows arrive pre-gathered through the precached step).
    # Costs one transient copy of dataset+cache in HBM for the epoch.
    onchip_contiguous: bool = False
    # Per-step tqdm progress bars over the train/val loaders (reference:
    # trainer.py:81,100 wraps both in tqdm). Off by default: the bar's
    # per-step loss read syncs the host every step, which costs throughput
    # on chained-dispatch paths (scan_steps shows per-chunk updates instead).
    progress: bool = False
    kd: KDConfig = field(default_factory=KDConfig)
    augment: AugmentConfig = field(default_factory=AugmentConfig)


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh for data-parallel training (no reference analog; the
    reference is single-device, SURVEY.md §2 parallelism note).

    model_parallel > 1 builds a 2-D ('data', 'model') mesh: batches stay
    sharded on 'data' and the KD teacher's channels are sharded on 'model'
    (parallel/tp.py) — tensor parallelism for teachers too wide for one
    chip. The student and every non-KD path simply replicate over the
    model axis (GSPMD treats an unused axis as replication), so
    model_parallel=1 is behavior-identical to the 1-D mesh."""

    data_axis: str = "data"
    model_axis: str = "model"
    num_devices: Optional[int] = None  # None = all visible devices
    model_parallel: int = 1


@dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


# Reference experiment presets -------------------------------------------------

def preset_pandaset_weighted() -> ExperimentConfig:
    """train_pandaset.py:79-163: 3-class weighted run, 30 epochs, concat-256."""
    return ExperimentConfig(
        model=ModelConfig(num_classes=3, fusion_type="concat",
                          fusion_out_channels=256),
        data=DataConfig(dataset="pandaset"),
        train=TrainConfig(num_epochs=30,
                          class_weights=(0.39, 2.61, 33.09),
                          save_dir="checkpoints/pandaset_weighted"),
    )


def preset_fusion_ablation(fusion_type: str) -> ExperimentConfig:
    """train_with_fusion_ablation.py:10-66: 2-class, 20 epochs per variant."""
    out_ch = {"concat": 256, "minimal": 128, "weighted": 128,
              "gated_sum": 128}[fusion_type]
    return ExperimentConfig(
        model=ModelConfig(num_classes=2, fusion_type=fusion_type,
                          fusion_out_channels=out_ch),
        data=DataConfig(dataset="pandaset"),
        train=TrainConfig(num_epochs=20, class_weights=(0.4, 3.5),
                          save_dir=f"checkpoints/fusion_ablation_{fusion_type}"),
    )
