"""Loader BIT-parity against the imported reference PandaSet loader.

VERDICT r4 missing #2: feed the same fabricated on-disk scene through the
reference `PandaSetDataset` (/root/reference/src/data_loading/
pandaset_dataset.py:48-141) and `lmsu_tpu.data.PandaSetDataset` and compare
samples byte-for-byte. With `max_points >= N` the deliberate
deterministic-downsampling divergence is out of the picture, so image bytes,
point arrays, label remap, and raster order can all be pinned exactly.

The only representation differences are documented contracts:
  * image: reference float32/255 CHW torch — ours uint8 HWC (the device
    step divides by 255; float32/255 of the same uint8 is exact);
  * ours adds `point_valid` (the reference treats zero-padding as real
    points, pandaset_dataset.py:124-126);
  * image_size: ours is (H, W) everywhere; the reference passes its tuple
    straight to PIL.resize, which reads it as (W, H)
    (pandaset_dataset.py:111) — pinned by the non-square test below.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pd = pytest.importorskip("pandas")

REFERENCE_ROOT = "/root/reference"
sys.path.insert(0, REFERENCE_ROOT)

try:
    from src.data_loading.pandaset_dataset import \
        PandaSetDataset as RefPandaSet
    from src.data_loading.pandaset_dataset import rasterize_bev as ref_raster
    from src.data_loading.pandaset_dataset import \
        remap_semantic as ref_remap
    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason="reference repo not importable")

from lmsu_tpu.data import PandaSetDataset  # noqa: E402
from lmsu_tpu.data.rasterize import rasterize_bev, remap_semantic  # noqa: E402


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    """Two scenes x 3 frames, n=400 points; scene 002 drops one semseg so
    both indexers must filter the same frame. Labels span the full raw-ID
    range so the remap + raster paths see both classes; duplicate-cell
    collisions are guaranteed by the coarse 8x8 grid."""
    from PIL import Image
    root = tmp_path_factory.mktemp("ref_parity")
    rng = np.random.default_rng(42)
    for sid in ("001", "002"):
        cam = root / sid / "camera" / "front_camera"
        lid = root / sid / "lidar"
        seg = root / sid / "annotations" / "semseg"
        for d in (cam, lid, seg):
            d.mkdir(parents=True)
        for f in range(3):
            fid = f"{f:02d}"
            Image.fromarray(
                rng.integers(0, 255, (60, 80, 3)).astype(np.uint8)
            ).save(cam / f"{fid}.jpg")
            n = 400
            pd.DataFrame({
                "x": rng.uniform(-80, 80, n).astype(np.float32),
                "y": rng.uniform(-80, 80, n).astype(np.float32),
                "z": rng.uniform(-5, 3, n).astype(np.float32),
                "i": rng.uniform(0, 1, n).astype(np.float32),
            }).to_pickle(lid / f"{fid}.pkl")
            pd.DataFrame({
                "class": rng.integers(0, 14, n).astype(np.int64)
            }).to_pickle(seg / f"{fid}.pkl")
    (root / "002" / "annotations" / "semseg" / "02.pkl").unlink()
    return str(root)


KW = dict(image_size=(32, 32), grid_size=(8, 8))


class TestLoaderBitParity:
    def test_indexing_identical(self, scene_root):
        ref = RefPandaSet(scene_root, ["001", "002"], max_points=500,
                          verbose=False, **KW)
        ours = PandaSetDataset(scene_root, ["001", "002"], max_points=500,
                               **KW)
        assert len(ref) == len(ours) == 5  # 6 frames minus missing semseg
        for i in range(len(ref)):
            s_ref, s_ours = ref.samples[i], ours.samples[i]
            assert (s_ref["scene"], s_ref["frame"]) == (
                s_ours["scene"], s_ours["frame"])

    def test_samples_byte_equal_without_downsampling(self, scene_root):
        """max_points=500 >= 400 points: zero randomness anywhere — every
        field must match the reference to the BYTE."""
        ref = RefPandaSet(scene_root, ["001", "002"], max_points=500,
                          verbose=False, **KW)
        ours = PandaSetDataset(scene_root, ["001", "002"], max_points=500,
                               **KW)
        for i in range(len(ref)):
            a, b = ref[i], ours[i]
            assert b["sample_token"] == a["sample_token"]
            # image: CHW float32/255 vs HWC uint8 — exact after the same
            # normalization the device step applies.
            ref_img = a["image"].permute(1, 2, 0).numpy()
            np.testing.assert_array_equal(
                ref_img, b["image"].astype(np.float32) / 255.0)
            # points: identical file order + zero pad, byte-for-byte.
            np.testing.assert_array_equal(a["points"].numpy(), b["points"])
            assert b["points"].dtype == np.float32
            # our padding mask marks exactly the reference's zero-pad rows
            assert b["point_valid"].sum() == 400
            assert not b["point_valid"][400:].any()
            # labels: remap + raster byte-equal int64.
            np.testing.assert_array_equal(a["segmentation"].numpy(),
                                          b["segmentation"])
            assert b["segmentation"].dtype == np.int64

    def test_nonsquare_image_size_mapping(self, scene_root):
        """Documented divergence pin: our image_size is (H, W); the
        reference's tuple goes straight to PIL.resize = (W, H). Ours
        (H=48, W=64) must byte-match the reference given (64, 48)."""
        ref = RefPandaSet(scene_root, ["001"], max_points=500,
                          image_size=(64, 48), grid_size=(8, 8),
                          verbose=False)
        ours = PandaSetDataset(scene_root, ["001"], max_points=500,
                               image_size=(48, 64), grid_size=(8, 8))
        a, b = ref[0], ours[0]
        assert b["image"].shape == (48, 64, 3)
        np.testing.assert_array_equal(
            a["image"].permute(1, 2, 0).numpy(),
            b["image"].astype(np.float32) / 255.0)

    def test_rasterize_bev_matches_reference_multiclass(self, scene_root):
        """Direct function-level pin of the vectorized raster against the
        reference's per-point Python loop (pandaset_dataset.py:23-45),
        including MULTI-class labels (first-nonzero-wins in point order)
        and the truncation/clip cell math."""
        rng = np.random.default_rng(7)
        for trial in range(5):
            n = 600
            x = rng.uniform(-70, 70, n).astype(np.float32)
            y = rng.uniform(-70, 70, n).astype(np.float32)
            labels = rng.integers(0, 4, n).astype(np.int64)
            for grid in ((8, 8), (16, 16), (64, 64)):
                np.testing.assert_array_equal(
                    ref_raster(x, y, labels, grid_size=grid,
                               pc_range=(-50, 50, -50, 50)),
                    rasterize_bev(x, y, labels, grid_size=grid,
                                  pc_range=(-50, 50, -50, 50)))

    def test_remap_semantic_matches_reference(self, scene_root):
        raw = np.arange(-2, 50, dtype=np.int64)
        np.testing.assert_array_equal(ref_remap(raw), remap_semantic(raw))

    def test_downsample_divergence_documented(self, scene_root):
        """max_points=200 < 400: both loaders draw a 200-point subset
        without replacement — the reference from global np.random (access-
        order dependent), ours from a per-(seed, idx) Generator
        (deterministic, what makes cached-teacher KD sound). Pin the
        DISTRIBUTIONAL contract: same count, every row an exact row of the
        full cloud, no duplicates — and that the label raster is unaffected
        (both rasterize from the FULL cloud before downsampling,
        pandaset_dataset.py:133)."""
        np.random.seed(123)
        ref = RefPandaSet(scene_root, ["001"], max_points=200,
                          verbose=False, **KW)
        ours = PandaSetDataset(scene_root, ["001"], max_points=200, **KW)
        full = RefPandaSet(scene_root, ["001"], max_points=500,
                           verbose=False, **KW)
        for i in range(len(ref)):
            a, b, f = ref[i], ours[i], full[i]
            full_rows = {tuple(r) for r in f["points"].numpy()[:400]}
            for pts in (a["points"].numpy(), b["points"]):
                assert pts.shape == (200, 4)
                rows = [tuple(r) for r in pts]
                assert set(rows) <= full_rows
                assert len(set(rows)) == 200  # without replacement
            # raster comes from the full cloud in both loaders
            np.testing.assert_array_equal(a["segmentation"].numpy(),
                                          b["segmentation"])
            np.testing.assert_array_equal(f["segmentation"].numpy(),
                                          b["segmentation"])
