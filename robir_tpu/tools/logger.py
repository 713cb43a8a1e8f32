"""Experiment logger: tensorboard scalars/images/video/mesh + run dirs.

Parity: stage-1 ``neus/optimization/log.py`` (scalars/images/video/mesh/json
sinks, render timing) and the stage-2 runners' tensorboardX writers
(``train_normal.py:71-72``). Adds the rays/sec counter the reference left
commented out (``log.py:154-160``) as a first-class metric.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


class Logger:
    def __init__(self, log_dir: str, exp_name: str = "exp"):
        self.log_dir = os.path.join(log_dir, exp_name)
        os.makedirs(self.log_dir, exist_ok=True)
        self.plots_dir = os.path.join(self.log_dir, "plots")
        os.makedirs(self.plots_dir, exist_ok=True)
        self._writer = None
        self._t0 = time.time()
        self._desc_path = os.path.join(self.log_dir, "description.json")
        self._desc: dict = {}

    @property
    def writer(self):
        if self._writer is None:
            from tensorboardX import SummaryWriter
            self._writer = SummaryWriter(self.log_dir)
        return self._writer

    # -- sinks --------------------------------------------------------------

    def log_scalars(self, step: int, tag_prefix: str = "", **scalars) -> None:
        for k, v in scalars.items():
            tag = f"{tag_prefix}/{k}" if tag_prefix else k
            self.writer.add_scalar(tag, float(v), step)

    def log_rays_per_sec(self, step: int, rays_per_sec: float) -> None:
        self.writer.add_scalar("perf/rays_per_sec", rays_per_sec, step)

    def log_image(self, step: int, tag: str, img: np.ndarray) -> str:
        """img [H, W, 3] in [0,1]; also saved as PNG under plots/."""
        from PIL import Image
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        path = os.path.join(self.plots_dir, f"{tag}_{step}.png")
        Image.fromarray(arr).save(path)
        self.writer.add_image(tag, arr, step, dataformats="HWC")
        return path

    def log_video(self, tag: str, frames: list[np.ndarray], fps: int = 24) -> str:
        """Frames [H, W, 3] in [0,1] -> mp4 (gif fallback without ffmpeg)."""
        arrs = [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f in frames]
        path = os.path.join(self.plots_dir, f"{tag}.mp4")
        try:
            import imageio
            imageio.mimwrite(path, arrs, fps=fps)
        except Exception:
            from PIL import Image
            path = os.path.join(self.plots_dir, f"{tag}.gif")
            ims = [Image.fromarray(a) for a in arrs]
            ims[0].save(path, save_all=True, append_images=ims[1:],
                        duration=int(1000 / fps), loop=0)
        return path

    def log_mesh(self, step: int, mesh) -> str:
        path = os.path.join(self.log_dir, "meshes", f"mesh_{step:06d}.ply")
        mesh.export_ply(path)
        return path

    def log_json(self, **kv) -> None:
        """Run-description key-values (render_time etc., log.py:121-128)."""
        self._desc.update(kv)
        with open(self._desc_path, "w") as f:
            json.dump(self._desc, f, indent=2)

    def snapshot_config(self, cfg_dict: dict) -> None:
        with open(os.path.join(self.log_dir, "config.json"), "w") as f:
            json.dump(cfg_dict, f, indent=2)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
