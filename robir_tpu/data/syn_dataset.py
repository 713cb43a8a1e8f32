"""Stage-2 synthetic dataset (blender transforms + PNG/EXR frames).

Parity: ``datasets/syn_dataset.py`` — transforms_{split}.json; PNG images
linearized by gamma 2.2 or ``_rgb.exr`` HDR frames; ``_mask.png`` masks (or
alpha); pose translation scale / 2 into stage-2 coords (:56-58); test split
loads relit ground truth (envmap6/12, :101-115); random pixel subsampling
(:167-171).
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os

import numpy as np

from ..utils.exr import read_exr


def load_rgb(path: str) -> np.ndarray:
    """Linear-radiance image load (utils/rend_util.py:31-38): PNGs are
    gamma-2.2 decoded, EXRs pass through."""
    if path.endswith(".exr"):
        return read_exr(path)[..., :3]
    from PIL import Image
    img = np.asarray(Image.open(path), dtype=np.float32)[..., :3] / 255.0
    return np.power(img, 2.2)


def load_mask(path: str) -> np.ndarray:
    from PIL import Image
    alpha = np.asarray(Image.open(path), dtype=np.float32)
    if alpha.ndim == 3:
        alpha = alpha[..., 3]
    return alpha / 255.0 > 0.5


@dataclasses.dataclass
class SynDatasetConfig:
    instance_dir: str = ""
    frame_skip: int = 1
    split: str = "train"
    pose_scale: float = 2.0  # translations divided by this (:56-58)


class SynDataset:
    def __init__(self, cfg: SynDatasetConfig):
        self.cfg = cfg
        with open(os.path.join(cfg.instance_dir,
                               f"transforms_{cfg.split}.json")) as fp:
            meta = json.load(fp)

        blender = len(glob.glob(f"{cfg.instance_dir}/train/*.exr")) == 0

        image_paths, mask_paths, poses = [], [], []
        relit_paths = {"envmap6": [], "envmap12": []}
        for frame in meta["frames"]:
            poses.append(np.array(frame["transform_matrix"], np.float32))
            fp_ = frame["file_path"]
            if cfg.split == "train":
                image_paths.append(os.path.join(
                    cfg.instance_dir, fp_ + (".png" if blender else "_rgb.exr")))
                mask_paths.append(os.path.join(
                    cfg.instance_dir, fp_ + (".png" if blender else "_mask.png")))
            else:
                ind = fp_.split("/")[1]
                image_paths.append(os.path.join(cfg.instance_dir, fp_ + "_rgba.png"))
                for env in relit_paths:
                    relit_paths[env].append(os.path.join(
                        cfg.instance_dir, f"test_rli/{env}_{ind}.png"))

        first = load_rgb(image_paths[0])
        img_h, img_w = first.shape[:2]
        camera_angle_x = float(meta["camera_angle_x"])
        focal = 0.5 * img_w / np.tan(0.5 * camera_angle_x)
        poses = np.stack(poses)
        poses[..., 3] /= cfg.pose_scale

        sk = cfg.frame_skip
        image_paths = image_paths[::sk]
        mask_paths = mask_paths[::sk]
        poses = poses[::sk]

        self.n_cameras = len(image_paths)
        self.img_res = (img_h, img_w)
        self.total_pixels = img_h * img_w
        self.intrinsics = np.array(
            [[focal, 0, img_w / 2], [0, focal, img_h / 2], [0, 0, 1]], np.float32)
        self.poses = poses

        self.rgb_images = [load_rgb(p).reshape(-1, 3) for p in image_paths]
        if cfg.split == "train":
            self.object_masks = [load_mask(p).reshape(-1) for p in mask_paths]
        else:
            from PIL import Image
            self.object_masks = [
                (np.asarray(Image.open(p))[..., 3] > 128).reshape(-1)
                for p in image_paths]
            self.relit_images = {
                env: [load_rgb(p).reshape(-1, 3) for p in paths[::sk]]
                for env, paths in relit_paths.items()
                if paths and os.path.exists(paths[0])}

    # -- ray generation -----------------------------------------------------

    def full_uv(self) -> np.ndarray:
        """[H*W, 2] (x, y) pixel coords (syn_dataset.py:122-125)."""
        h, w = self.img_res
        grid = np.mgrid[0:h, 0:w].astype(np.float32)
        return np.flip(grid, axis=0).reshape(2, -1).T.copy()

    def camera_rays(self, idx: int, uv: np.ndarray | None = None):
        """uv -> (ray_dirs [N, 3], cam_loc [3]); the stage-2 camera model
        (utils/rend_util.py:51-97 get_camera_params/lift)."""
        if uv is None:
            uv = self.full_uv()
        K = self.intrinsics
        pose = self.poses[idx]
        fx, fy = K[0, 0], K[1, 1]
        cx, cy = K[0, 2], K[1, 2]
        x_lift = (uv[:, 0] - cx) / fx
        y_lift = (uv[:, 1] - cy) / fy
        pts_cam = np.stack([x_lift, -y_lift, -np.ones_like(x_lift),
                            np.ones_like(x_lift)], -1)
        world = (pose @ pts_cam.T).T[:, :3]
        cam_loc = pose[:3, 3]
        dirs = world - cam_loc
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        return dirs.astype(np.float32), cam_loc.astype(np.float32)

    def sample_pixels(self, rng: np.random.Generator, idx: int, n: int) -> dict:
        """Random pixel batch for one camera (change_sampling_idx analog).

        choice(replace=False) matches randperm[:n]'s distribution without
        building a full H*W permutation + uv grid every batch (640k-element
        host allocations per step at 800x800 just to pick ~1k pixels)."""
        sel = rng.choice(self.total_pixels, size=n, replace=False)
        w = self.img_res[1]
        # full_uv() row i is (x=i%w, y=i//w) — derive arithmetically
        uv = np.stack([(sel % w).astype(np.float32),
                       (sel // w).astype(np.float32)], -1)
        dirs, cam_loc = self.camera_rays(idx, uv)
        return {
            "uv": uv,
            "points": np.broadcast_to(cam_loc, dirs.shape).copy(),
            "dirs": dirs,
            "object_mask": self.object_masks[idx][sel],
            "rgb": self.rgb_images[idx][sel],
        }

    def masked_pixels(self) -> np.ndarray:
        """All in-mask pixels across the dataset (for the Energy prefit,
        model/energy_integral.py:51-61)."""
        out = [img[m] for img, m in zip(self.rgb_images, self.object_masks)]
        return np.concatenate(out, 0)
