"""Procedural synthetic scene: analytic ground-truth for end-to-end tests.

The reference repo assumes the NeRF-synthetic dataset exists on disk; this
environment has no datasets, so tests and benchmarks train against a
procedurally generated blender-format scene whose ground truth is computed
analytically (ray-traced lambertian sphere on a white background). This
exercises exactly the same code path as a real blender scene — loader, ray
generation, masks, white background — with a known-recoverable geometry.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .blender import BlenderConfig, BlenderScene


def look_at(eye: np.ndarray, target: np.ndarray, up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """OpenGL-style c2w: camera -z looks at target (blender convention)."""
    forward = target - eye
    forward = forward / np.linalg.norm(forward)
    right = np.cross(forward, np.asarray(up, np.float64))
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, forward)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -forward  # camera looks along -z
    c2w[:3, 3] = eye
    return c2w


def render_sphere_gt(c2w: np.ndarray, h: int, w: int, focal: float,
                     radius: float = 0.5,
                     albedo=(0.8, 0.3, 0.2),
                     light_dir=(0.5, 0.3, 0.8)) -> np.ndarray:
    """Analytic RGBA image of a lambertian sphere at the origin."""
    x, y = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32), indexing="xy")
    dirs = np.stack([(x - w * 0.5 + 0.5) / focal,
                     -(y - h * 0.5 + 0.5) / focal,
                     -np.ones_like(x)], -1)
    dirs = dirs @ c2w[:3, :3].T
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = c2w[:3, 3]

    # |o + t d|^2 = r^2
    b = 2.0 * dirs @ o
    c = float(o @ o) - radius * radius
    disc = b * b - 4 * c
    hit = disc > 0
    t = (-b - np.sqrt(np.maximum(disc, 0.0))) / 2.0
    hit &= t > 0

    pts = o[None, None] + t[..., None] * dirs
    normals = pts / radius
    ld = np.asarray(light_dir, np.float32)
    ld = ld / np.linalg.norm(ld)
    lambert = np.clip(normals @ ld, 0.0, 1.0) * 0.8 + 0.2  # + ambient
    rgb = lambert[..., None] * np.asarray(albedo, np.float32)

    img = np.zeros((h, w, 4), np.float32)
    img[..., :3] = np.where(hit[..., None], rgb, 1.0)
    img[..., 3] = hit.astype(np.float32)
    return img


def make_sphere_dataset(out_dir: str, n_train: int = 20, n_test: int = 4,
                        h: int = 64, w: int = 64,
                        camera_angle_x: float = 0.6911112070083618,
                        cam_dist: float = 3.0, radius: float = 0.5,
                        seed: int = 0) -> str:
    """Write a blender-format sphere scene under ``out_dir``; returns it."""
    from PIL import Image

    focal = 0.5 * w / np.tan(0.5 * camera_angle_x)
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("test", n_test), ("val", 2)):
        frames = []
        os.makedirs(os.path.join(out_dir, split), exist_ok=True)
        for i in range(n):
            theta = (i / n) * 2 * np.pi + float(rng.uniform(0, 0.1))
            phi = float(rng.uniform(0.2, 1.2))
            eye = cam_dist * np.array([
                np.cos(theta) * np.cos(phi),
                np.sin(theta) * np.cos(phi),
                np.sin(phi)], np.float32)
            c2w = look_at(eye, np.zeros(3, np.float32))
            img = render_sphere_gt(c2w, h, w, focal, radius=radius)
            name = f"{split}/r_{i}"
            Image.fromarray((img * 255).astype(np.uint8), "RGBA").save(
                os.path.join(out_dir, name + ".png"))
            frames.append({"file_path": name,
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as fp:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, fp)
    return out_dir


def sphere_scene(tmp_dir: str, **kwargs) -> BlenderScene:
    make_sphere_dataset(tmp_dir, **kwargs)
    return BlenderScene(BlenderConfig(dataset_dir=tmp_dir), "train")
