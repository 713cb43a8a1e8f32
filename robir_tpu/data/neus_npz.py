"""IDR/NeuS ``cameras_sphere.npz`` datasets (DTU-style real scenes).

Covers both programs' loaders:
- stage-1 ``neus/dataset/neus_dataset.py``: world/scale projection matrices
  decomposed into K/Rt (``load_K_Rt_from_P:13-34``), per-camera ray
  generation (``gen_rays_at:101-114``, ``gen_random_rays_at:116-133``),
  pose-slerp novel paths (``gen_rays_between:135-166``), sphere-based
  near/far (``near_far_from_sphere:168-174``), BGR image flip.
- stage-2 ``datasets/DTU.py`` (SceneDataset): the same cameras with the
  axis-flip normalization and pose scale x0.5 into stage-2 coords
  (``:55-80``), exposed through the SynDataset-style interface the stage-2
  runners consume.
"""

from __future__ import annotations

import dataclasses
import glob
import os

import numpy as np


def load_K_Rt_from_P(P: np.ndarray):
    """Decompose [3,4] projection into (intrinsics [4,4], c2w pose [4,4])."""
    import cv2
    K, R, t = cv2.decomposeProjectionMatrix(P)[:3]
    K = K / K[2, 2]
    intrinsics = np.eye(4, dtype=np.float32)
    intrinsics[:3, :3] = K
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics, pose


def _load_images(paths, bgr_flip=True):
    import cv2
    imgs = []
    for p in paths:
        img = cv2.imread(p).astype(np.float32) / 256.0
        if bgr_flip:
            img = img[..., ::-1].copy()
        imgs.append(img)
    return np.stack(imgs)


@dataclasses.dataclass
class NeuSNpzConfig:
    data_dir: str = ""
    render_cameras_name: str = "cameras_sphere.npz"
    ext: str = "png"


class NeuSNpzDataset:
    """Stage-1 loader (parity: neus/dataset/neus_dataset.py Dataset)."""

    def __init__(self, cfg: NeuSNpzConfig):
        self.cfg = cfg
        cams = np.load(os.path.join(cfg.data_dir, cfg.render_cameras_name))
        image_paths = sorted(glob.glob(
            os.path.join(cfg.data_dir, f"image/*.{cfg.ext}")))
        mask_paths = sorted(glob.glob(
            os.path.join(cfg.data_dir, f"mask/*.{cfg.ext}")))
        self.n_images = len(image_paths)
        self.images = _load_images(image_paths)            # [N, H, W, 3] rgb
        self.masks = _load_images(mask_paths, bgr_flip=False)

        self.intrinsics = []
        self.poses = []
        self.scale_mats = []
        for i in range(self.n_images):
            scale_mat = cams[f"scale_mat_{i}"].astype(np.float32)
            world_mat = cams[f"world_mat_{i}"].astype(np.float32)
            P = (world_mat @ scale_mat)[:3, :4]
            K, pose = load_K_Rt_from_P(P)
            self.intrinsics.append(K)
            self.poses.append(pose)
            self.scale_mats.append(scale_mat)
        self.intrinsics = np.stack(self.intrinsics)
        self.intrinsics_inv = np.linalg.inv(self.intrinsics)
        self.poses = np.stack(self.poses)
        self.h, self.w = self.images.shape[1:3]

    # -- rays ---------------------------------------------------------------

    def gen_rays_at(self, idx: int, resolution_level: int = 1):
        """Full-image rays -> (origins [H', W', 3], dirs [H', W', 3])."""
        ll = resolution_level
        tx = np.linspace(0, self.w - 1, self.w // ll, dtype=np.float32)
        ty = np.linspace(0, self.h - 1, self.h // ll, dtype=np.float32)
        px, py = np.meshgrid(tx, ty, indexing="xy")
        p = np.stack([px, py, np.ones_like(px)], -1)
        p = np.einsum("ij,hwj->hwi", self.intrinsics_inv[idx, :3, :3], p)
        v = p / np.linalg.norm(p, axis=-1, keepdims=True)
        v = np.einsum("ij,hwj->hwi", self.poses[idx, :3, :3], v)
        o = np.broadcast_to(self.poses[idx, :3, 3], v.shape).copy()
        return o.astype(np.float32), v.astype(np.float32)

    def gen_random_rays_at(self, rng: np.random.Generator, idx: int, n: int):
        """Random-pixel batch -> dict(origins, dirs, rgb, mask)."""
        px = rng.integers(0, self.w, n)
        py = rng.integers(0, self.h, n)
        color = self.images[idx][py, px]
        mask = self.masks[idx][py, px, :1]
        p = np.stack([px, py, np.ones_like(px)], -1).astype(np.float32)
        p = (self.intrinsics_inv[idx, :3, :3] @ p.T).T
        v = p / np.linalg.norm(p, axis=-1, keepdims=True)
        v = (self.poses[idx, :3, :3] @ v.T).T
        o = np.broadcast_to(self.poses[idx, :3, 3], v.shape).copy()
        return {"origins": o.astype(np.float32), "dirs": v.astype(np.float32),
                "rgb": color.astype(np.float32), "mask": mask.astype(np.float32)}

    def gen_rays_between(self, idx0: int, idx1: int, ratio: float,
                         resolution_level: int = 1):
        """Novel view on the slerp path between two cameras
        (neus_dataset.py:135-166)."""
        from scipy.spatial.transform import Rotation, Slerp
        rots = Rotation.from_matrix(self.poses[[idx0, idx1], :3, :3])
        slerp = Slerp([0, 1], rots)
        rot = slerp(ratio).as_matrix().astype(np.float32)
        trans = ((1 - ratio) * self.poses[idx0, :3, 3]
                 + ratio * self.poses[idx1, :3, 3])
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = rot
        pose[:3, 3] = trans
        saved = self.poses[idx0].copy()
        try:
            self.poses[idx0] = pose
            return self.gen_rays_at(idx0, resolution_level)
        finally:
            self.poses[idx0] = saved

    @staticmethod
    def near_far_from_sphere(rays_o: np.ndarray, rays_d: np.ndarray):
        """Unit-sphere clip planes (neus_dataset.py:168-174)."""
        a = np.sum(rays_d ** 2, -1, keepdims=True)
        b = 2.0 * np.sum(rays_o * rays_d, -1, keepdims=True)
        mid = 0.5 * (-b) / a
        return mid - 1.0, mid + 1.0


@dataclasses.dataclass
class NeuSNpzSceneConfig:
    dataset_dir: str = ""
    batch_size: int = 512
    render_cameras_name: str = "cameras_sphere.npz"
    ext: str = "png"
    test_resolution_level: int = 4


class NeuSNpzScene:
    """Stage-1 training adapter over :class:`NeuSNpzDataset` exposing the
    BlenderScene interface the NeuS trainer consumes.

    Parity: reference ``neus/dataset/interface.py`` NeuSDatasetWrapper
    (:182-243) — random-pixel batches with sphere-based near/far
    (``near_far_from_sphere``), mask as lossmult, zero radii (the mip cone
    radius is a blender-loader concept).
    """

    def __init__(self, cfg: NeuSNpzSceneConfig, split: str = "train",
                 base: "NeuSNpzDataset | None" = None):
        from .blender import RayBatch
        self._RayBatch = RayBatch
        self.cfg = cfg
        # `base` lets train/test splits share one loaded dataset (npz
        # scenes have no separate test images — the reference wrapper
        # renders train views at reduced resolution, interface.py:197)
        self.base = base if base is not None else NeuSNpzDataset(
            NeuSNpzConfig(data_dir=cfg.dataset_dir,
                          render_cameras_name=cfg.render_cameras_name,
                          ext=cfg.ext))
        self.split = split
        # eval renders run at reduced resolution like the reference wrapper
        # (interface.py:197, resolution_level=2/4)
        self._ll = 1 if split == "train" else max(1, cfg.test_resolution_level)
        self.h = self.base.h // self._ll
        self.w = self.base.w // self._ll
        self.n_images = self.base.n_images
        if self._ll == 1:
            self.images = self.base.images
            self.masks = self.base.masks[..., :1]
        else:
            # nearest-neighbor at the same pixel centers gen_rays_at uses
            # (linspace over [0, w-1]), so eval rays and GT stay aligned
            tx = np.rint(np.linspace(0, self.base.w - 1, self.w)).astype(int)
            ty = np.rint(np.linspace(0, self.base.h - 1, self.h)).astype(int)
            self.images = self.base.images[:, ty][:, :, tx]
            self.masks = self.base.masks[:, ty][:, :, tx, :1]

    def _bundle(self, o, v, rgb, mask):
        near, far = NeuSNpzDataset.near_far_from_sphere(o, v)
        ones = np.ones_like(o[..., :1])
        return self._RayBatch(
            origins=o.astype(np.float32), directions=v.astype(np.float32),
            viewdirs=v.astype(np.float32), radii=np.zeros_like(ones),
            lossmult=mask.astype(np.float32),
            near=near.astype(np.float32), far=far.astype(np.float32),
            pixels=rgb.astype(np.float32))

    def sample(self, rng: np.random.Generator, batch_size: int | None = None):
        n = batch_size or self.cfg.batch_size
        idx = int(rng.integers(0, self.n_images))
        d = self.base.gen_random_rays_at(rng, idx, n)
        return self._bundle(d["origins"], d["dirs"], d["rgb"], d["mask"])

    def image_rays(self, idx: int):
        o, v = self.base.gen_rays_at(idx, resolution_level=self._ll)
        o = o[:self.h, :self.w].reshape(-1, 3)
        v = v[:self.h, :self.w].reshape(-1, 3)
        rgb = self.images[idx].reshape(-1, 3)
        mask = self.masks[idx].reshape(-1, 1)
        return self._bundle(o, v, rgb, mask)


@dataclasses.dataclass
class DTUConfig:
    data_dir: str = ""
    frame_skip: int = 1
    downscale: float = 1.0
    cam_file: str | None = None


class DTUSceneDataset:
    """Stage-2 real-scene dataset (parity: datasets/DTU.py SceneDataset):
    exposes the SynDataset interface used by the stage-2 runners."""

    def __init__(self, cfg: DTUConfig):
        base = NeuSNpzDataset(NeuSNpzConfig(data_dir=cfg.data_dir))
        sk = cfg.frame_skip
        self.img_res = (base.h, base.w)
        self.total_pixels = base.h * base.w
        self.n_cameras = len(range(0, base.n_images, sk))
        self.rgb_images = [base.images[i].reshape(-1, 3)
                           for i in range(0, base.n_images, sk)]
        self.object_masks = [base.masks[i, ..., 0].reshape(-1) > 0.5
                             for i in range(0, base.n_images, sk)]
        self.intrinsics = base.intrinsics[0, :3, :3]

        poses = []
        for i in range(0, base.n_images, sk):
            pose = base.poses[i].copy()
            # axis-flip normalization + scale x0.5 (datasets/DTU.py:60-80)
            a, b, c = pose[0:1], pose[1:2], pose[2:3]
            pose = np.concatenate([a, -c, -b, pose[3:]], 0)
            S = np.eye(3, dtype=np.float32)
            S[1, 1] = S[2, 2] = -1
            pose[1, 3] = -pose[1, 3]
            pose[2, 3] = -pose[2, 3]
            pose[:3, :3] = S @ pose[:3, :3] @ S
            a, b, c = pose[0:1], pose[1:2], pose[2:3]
            pose = np.concatenate([a, c, b, pose[3:]], 0)
            pose[:, 3] *= 0.5
            poses.append(pose)
        self.poses = np.stack(poses)

    # SynDataset-compatible interface ---------------------------------------

    def full_uv(self) -> np.ndarray:
        h, w = self.img_res
        grid = np.mgrid[0:h, 0:w].astype(np.float32)
        return np.flip(grid, axis=0).reshape(2, -1).T.copy()

    def camera_rays(self, idx: int, uv: np.ndarray | None = None):
        from .syn_dataset import SynDataset
        return SynDataset.camera_rays(self, idx, uv)  # same camera model

    def sample_pixels(self, rng: np.random.Generator, idx: int, n: int) -> dict:
        from .syn_dataset import SynDataset
        return SynDataset.sample_pixels(self, rng, idx, n)

    def masked_pixels(self) -> np.ndarray:
        out = [img[m] for img, m in zip(self.rgb_images, self.object_masks)]
        return np.concatenate(out, 0)
