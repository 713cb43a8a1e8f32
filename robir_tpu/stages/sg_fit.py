"""Standalone SG envmap fit: the smallest full training loop (M0).

Parity: reference ``envmaps/fit_envmap_with_sg.py`` — fit ``num_sg``
spherical Gaussians to a ground-truth lat-long envmap by Adam on image MSE
(lr 1e-2; init lobes ~ N(0,1) with lambda x100). Produces the ``sg_128.npy``
assets relighting consumes (``model/sg_envmap_material.py:257-268``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..render.sg import compute_envmap


@dataclasses.dataclass(frozen=True)
class SGFitConfig:
    num_sg: int = 128
    lr: float = 1e-2
    n_iters: int = 100_000
    H: int = 256
    W: int = 512


def init_lgt_sgs(key: jax.Array, num_sg: int) -> jnp.ndarray:
    """lobe(3) + lambda(1, x100) + mu(3) ~ randn (fit_envmap_with_sg.py:37-38)."""
    sgs = jax.random.normal(key, (num_sg, 7))
    return sgs.at[:, 3:4].multiply(100.0)


def make_fit_step(gt_envmap: jnp.ndarray,
                  optimizer: optax.GradientTransformation) -> Callable:
    H, W = gt_envmap.shape[:2]

    @jax.jit
    def step(sgs, opt_state):
        def loss_fn(p):
            em = compute_envmap(p, H, W)
            return jnp.mean((em - gt_envmap) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(sgs)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(sgs, updates), opt_state, loss

    return step


def fit_envmap(gt_envmap: np.ndarray, cfg: SGFitConfig = SGFitConfig(),
               seed: int = 0, init: np.ndarray | None = None,
               log_every: int = 0,
               log_fn: Callable[[int, float], None] | None = None):
    """Run the fit; returns (lgt_sgs [num_sg, 7], final loss)."""
    import cv2
    gt = gt_envmap
    if gt.shape[:2] != (cfg.H, cfg.W):
        gt = cv2.resize(gt, (cfg.W, cfg.H), interpolation=cv2.INTER_AREA)
    gt = jnp.asarray(gt[..., :3])

    sgs = (jnp.asarray(init) if init is not None
           else init_lgt_sgs(jax.random.PRNGKey(seed), cfg.num_sg))
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(sgs)
    step = make_fit_step(gt, optimizer)

    loss = jnp.inf
    for i in range(cfg.n_iters):
        sgs, opt_state, loss = step(sgs, opt_state)
        if log_every and (i % log_every == 0) and log_fn is not None:
            log_fn(i, float(loss))
    return np.asarray(sgs), float(loss)


def main(argv=None):
    import argparse
    from ..utils.exr import read_exr, write_exr
    parser = argparse.ArgumentParser()
    parser.add_argument("--envmap_path", type=str, required=True)
    parser.add_argument("--num_sg", type=int, default=128)
    parser.add_argument("--n_iters", type=int, default=100_000)
    parser.add_argument("--out_dir", type=str, default=None)
    args = parser.parse_args(argv)

    gt = read_exr(args.envmap_path)
    out_dir = args.out_dir or os.path.splitext(args.envmap_path)[0]
    os.makedirs(out_dir, exist_ok=True)
    cfg = SGFitConfig(num_sg=args.num_sg, n_iters=args.n_iters)

    def log(i, loss):
        print(f"step: {i}, loss: {loss}")

    sgs, loss = fit_envmap(gt, cfg, log_every=100, log_fn=log)
    np.save(os.path.join(out_dir, f"sg_{args.num_sg}.npy"), sgs)
    em = np.asarray(compute_envmap(jnp.asarray(sgs), cfg.H, cfg.W))
    write_exr(os.path.join(out_dir, f"fit_{args.num_sg}.exr"), em)
    print(f"final loss: {loss}")


if __name__ == "__main__":
    main()
