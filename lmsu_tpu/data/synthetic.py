"""Synthetic multi-modal dataset — the hermetic no-real-data fixture.

Resurrects the reference's deleted SyntheticMultiModalDataset (SURVEY.md
§2.26; only bytecode survives in the reference checkout): procedurally
generated camera image + LiDAR cloud + BEV segmentation with the same item
contract {image, points, segmentation, sample_token} as the PandaSet dataset
(pandaset_dataset.py:136-141).

Generation is deterministic per (seed, index): samples draw a random road
pattern (straight / curved / intersection) in BEV space, scatter LiDAR
points densely on the road and sparsely off it, and render a top-down
camera view of the same scene so both modalities carry signal about the
drivable mask — the E2E training tests rely on the task being learnable.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from lmsu_tpu.config import DataConfig


class SyntheticMultiModalDataset:
    def __init__(self, num_samples: int = 1000,
                 image_size: Tuple[int, int] = (256, 256),
                 grid_size: Tuple[int, int] = (64, 64),
                 max_points: int = 5000,
                 pc_range: Tuple[float, float, float, float] = (-50, 50, -50, 50),
                 seed: int = 0,
                 cache: bool = True):
        self.num_samples = num_samples
        self.image_size = image_size
        self.grid_size = grid_size
        self.max_points = max_points
        self.pc_range = pc_range
        self.seed = seed
        # Samples are deterministic per (seed, idx); caching turns epoch 2+
        # host cost to ~zero (~0.9 MB/sample at the default shapes).
        self._cache: Dict[int, Dict[str, np.ndarray]] = {} if cache else None

    def __len__(self) -> int:
        return self.num_samples

    def _road_mask(self, rng: np.random.Generator) -> np.ndarray:
        """Random drivable-area pattern on the BEV grid."""
        H, W = self.grid_size
        yy, xx = np.mgrid[0:H, 0:W]
        kind = rng.integers(0, 3)
        width = rng.uniform(0.10, 0.22) * W
        if kind == 0:  # straight road, random angle/offset
            theta = rng.uniform(0, np.pi)
            offset = rng.uniform(-0.25, 0.25) * W
            d = (xx - W / 2) * np.cos(theta) + (yy - H / 2) * np.sin(theta)
            mask = np.abs(d - offset) < width
        elif kind == 1:  # curved road (quadratic)
            a = rng.uniform(-0.02, 0.02)
            b = rng.uniform(-0.5, 0.5)
            c = rng.uniform(0.3, 0.7) * W
            centre = a * (yy - H / 2) ** 2 + b * yy + c
            mask = np.abs(xx - centre) < width
        else:  # intersection: two perpendicular roads
            mask = (np.abs(xx - rng.uniform(0.3, 0.7) * W) < width) | \
                   (np.abs(yy - rng.uniform(0.3, 0.7) * H) < width)
        return mask.astype(np.int64)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        item = self._generate(idx)
        if self._cache is not None:
            self._cache[idx] = item
        return item

    def _generate(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, idx]))
        H, W = self.grid_size
        ih, iw = self.image_size
        x_min, x_max, y_min, y_max = self.pc_range

        road = self._road_mask(rng)

        # --- LiDAR: dense returns on road cells, sparse clutter elsewhere ---
        n_total = self.max_points
        n_road = int(n_total * 0.6)
        road_cells = np.argwhere(road > 0)
        if len(road_cells) == 0:
            road_cells = np.array([[H // 2, W // 2]])
        pick = road_cells[rng.integers(0, len(road_cells), n_road)]
        jitter = rng.uniform(0, 1, (n_road, 2))
        rx = x_min + (pick[:, 1] + jitter[:, 0]) / W * (x_max - x_min)
        ry = y_min + (pick[:, 0] + jitter[:, 1]) / H * (y_max - y_min)
        rz = rng.normal(-1.8, 0.05, n_road)          # flat ground returns
        ri = rng.uniform(0.6, 1.0, n_road)           # bright road surface

        n_bg = n_total - n_road
        bx = rng.uniform(x_min * 1.2, x_max * 1.2, n_bg)  # some out-of-range
        by = rng.uniform(y_min * 1.2, y_max * 1.2, n_bg)
        bz = rng.uniform(-1.5, 3.0, n_bg)             # obstacles/vegetation
        bi = rng.uniform(0.0, 0.5, n_bg)
        pts = np.stack([np.concatenate([rx, bx]), np.concatenate([ry, by]),
                        np.concatenate([rz, bz]), np.concatenate([ri, bi])],
                       axis=1).astype(np.float32)
        pts = pts[rng.permutation(n_total)]

        # --- Camera: top-down render of the same scene + noise ---
        # Nearest-neighbor upsample via index mapping: exact for integer
        # ratios (where it equals np.kron) and correct for ANY image/grid
        # combination, including non-multiples and image_size < grid_size
        # (kron with a zero-or-truncated tile would crash or misalign).
        up = road[(np.arange(ih) * H) // ih][:, (np.arange(iw) * W) // iw]
        img = np.empty((ih, iw, 3), np.float32)
        img[..., 0] = np.where(up > 0, 0.45, 0.15)
        img[..., 1] = np.where(up > 0, 0.45, 0.40)
        img[..., 2] = np.where(up > 0, 0.50, 0.15)
        img += rng.normal(0, 0.05, img.shape).astype(np.float32)
        img = np.clip(img, 0.0, 1.0)
        # uint8 transport: 4x less host->device traffic; the model
        # normalizes back to [0,1] on device (models/fusion.py).
        img = np.round(img * 255.0).astype(np.uint8)

        return {
            "image": img,                            # [ih, iw, 3] uint8 NHWC
            "points": pts,                           # [max_points, 4] float32
            "segmentation": road,                    # [H, W] int64
            "sample_token": f"synthetic_{idx:06d}",
        }


def create_synthetic_datasets(config: DataConfig,
                              seed: int = 0
                              ) -> Tuple[SyntheticMultiModalDataset,
                                         SyntheticMultiModalDataset]:
    """Train/val split with disjoint seeds (reference §2.26:
    create_synthetic_dataloaders(num_train=800, num_val=200))."""
    train = SyntheticMultiModalDataset(
        num_samples=config.synthetic_num_train, image_size=config.image_size,
        grid_size=config.grid_size, max_points=config.max_points,
        pc_range=config.pc_range, seed=seed)
    val = SyntheticMultiModalDataset(
        num_samples=config.synthetic_num_val, image_size=config.image_size,
        grid_size=config.grid_size, max_points=config.max_points,
        pc_range=config.pc_range, seed=seed + 10_000)
    return train, val
