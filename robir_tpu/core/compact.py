"""Exact masked compaction for ragged work under static shapes.

The reference compacts ragged work with boolean indexing — e.g.
``trace_radiance`` only evaluates the borrowed NeuS color at secondary-ray
HIT points (model/implicit_differentiable_renderer.py:566-650), and the
octree casts only the rays still alive (utils/octree.py:493-585, the host
``while k.any()`` loop). Dynamic shapes don't exist under XLA, so the
TPU-native port of that idea is:

  1. sort rows so the needed ones pack into the leading chunks
     (``lax.sort`` with the row payloads as extra operands — no gathers,
     which are the expensive op class on TPU),
  2. scan over fixed-size chunks, running the expensive ``fn`` only on
     chunks that contain at least one needed row (``lax.cond`` — a real
     branch inside the scan's While body, so skipped chunks cost nothing),
  3. sort back by the carried original index.

This is EXACT: every needed row is evaluated with its true inputs (a
boundary chunk may also evaluate some un-needed rows, whose outputs are
zeroed). Compute scales with ``ceil(n_needed / chunk)`` instead of ``n``.

Under a sharded batch (``mesh`` given), the sort/scan runs PER SHARD via
``jax.shard_map`` — each device sorts and chunk-scans only its own rows,
so the compaction inserts NO cross-device collective (the global
``lax.sort`` would otherwise become an all-to-all over the mesh, undoing
the sharding of the very batch it is compacting). The per-shard form is
still exact: rows never cross shards, each shard zeroes its own un-needed
rows. Skipping is per-shard (a chunk is skipped when that SHARD has no
remaining needed rows in it), which is the same expected win under the
i.i.d. pixel batches every stage samples.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import DATA_AXIS


def _to_columns(arrs: Sequence[jnp.ndarray]):
    """Flatten [N, ...] arrays into [N] columns (lax.sort wants same-shape
    operands). Returns (columns, specs) where specs rebuild the arrays."""
    cols, specs = [], []
    for a in arrs:
        trailing = a.shape[1:]
        flat = a.reshape(a.shape[0], -1) if trailing else a.reshape(-1, 1)
        specs.append((trailing, a.dtype, flat.shape[1]))
        for j in range(flat.shape[1]):
            cols.append(flat[:, j])
    return cols, specs


def _from_columns(cols: Sequence[jnp.ndarray], specs):
    arrs, k = [], 0
    for trailing, dtype, width in specs:
        stacked = jnp.stack(cols[k:k + width], axis=1)
        k += width
        arrs.append(stacked.reshape((-1,) + trailing).astype(dtype))
    return arrs


def _sort_by(key: jnp.ndarray, arrs: Sequence[jnp.ndarray],
             wide_threshold: int = 24):
    """Sort rows of every array by ``key`` (ascending).

    Narrow payloads ride the sort as extra ``lax.sort`` operands (gather-
    free — the TPU-friendly path for few-column payloads like ray
    origins). Wide payloads (e.g. [N, 24, 7] SG sets) would explode into
    hundreds of sort operands, so beyond ``wide_threshold`` total columns
    the permutation is applied with row gathers instead — wide rows
    amortize the gather overhead."""
    width = sum(int(np.prod(a.shape[1:])) if a.ndim > 1 else 1 for a in arrs)
    if width > wide_threshold:
        order = jnp.argsort(key, stable=True)
        return key[order], [jnp.take(a, order, axis=0) for a in arrs]
    cols, specs = _to_columns(arrs)
    # sortable dtypes only — bools ride as int8
    cast = [c.astype(jnp.int8) if c.dtype == jnp.bool_ else c for c in cols]
    out = jax.lax.sort((key, *cast), num_keys=1, is_stable=True)
    return out[0], _from_columns(out[1:], specs)


def mesh_shards(mesh, axis: str = DATA_AXIS) -> int:
    """Number of shards the leading batch axis splits into (1 = unsharded)."""
    if mesh is None:
        return 1
    return int(dict(mesh.shape).get(axis, 1))


def effective_chunk(n: int, chunk: int, mesh=None,
                    axis: str = DATA_AXIS) -> int:
    """Decide whether (and at what chunk size) to compact a length-``n``
    batch. Returns 0 for "run dense".

    Single-device rule (unchanged from round 3): compaction needs at least
    two chunks to have anything to skip, so ``n > chunk`` gates it. Under a
    mesh the gate applies PER SHARD — and when the configured chunk is too
    large for the per-shard rows (the case the round-3 guards silently hit:
    per-device batches of a sharded job are 1/shards the size the chunk was
    tuned for), the chunk auto-lowers to half the shard so sharded batches
    keep ≥2 chunks per shard instead of silently falling back to dense.
    """
    if not chunk or chunk <= 0 or n <= 0:
        return 0
    shards = mesh_shards(mesh, axis)
    if shards > 1 and n % shards:
        shards = 1  # uneven split: compact_apply falls back to global sort
    ns = n // shards
    if ns > chunk:
        return chunk
    if shards > 1 and ns >= 64:
        return max(32, ns // 2)
    return 0


def compact_apply(fn: Callable, need: jnp.ndarray,
                  inputs: Sequence[jnp.ndarray], chunk: int,
                  mesh=None, axis: str = DATA_AXIS, consts=None):
    """Apply ``fn`` to the rows of ``inputs`` where ``need`` is True.

    fn takes per-chunk rows (``[chunk, ...]`` of each input) and returns a
    pytree of ``[chunk, ...]`` arrays. Returns the same pytree at full
    length ``n``, with rows where ``~need`` zeroed. Work done scales with
    ``ceil(n_need / chunk)`` chunks instead of ``n / chunk``.

    ``consts`` (optional pytree of arrays — parameters, grids, RNG keys)
    is forwarded to ``fn`` as its LAST positional argument. In the local
    path this is mere plumbing; under a mesh it is load-bearing: every
    array entering the shard_map region must come through ``in_specs``
    (consts ride as replicated ``P()`` operands, rows as ``P(axis)``).
    Arrays merely CLOSED OVER by ``fn`` break under ``shard_map`` — the
    sub-jaxprs (the scan/cond bodies) get traced against the closure's
    Auto-mesh-typed avals and fail the manual-region typecheck, and the
    backward hits the same mismatch — so when ``mesh`` is given, ``fn``
    must not close over traced arrays; route them via ``consts``.
    Cotangents of consts sum across shards exactly like the dense sharded
    program's (the replicated-operand transpose is a psum).

    With ``mesh`` (and the rows sharded over ``axis``), the whole
    sort/scan/unsort runs inside ``jax.shard_map`` so each device compacts
    its own rows — no collective is inserted by the compaction itself.
    """
    n = need.shape[0]
    shards = mesh_shards(mesh, axis)
    if shards > 1 and n % shards == 0:
        from jax.sharding import PartitionSpec as P

        spec = P(axis)
        c = min(chunk, n // shards)
        const_leaves, const_def = jax.tree_util.tree_flatten(
            consts if consts is not None else ())
        nc = len(const_leaves)

        def per_shard(need_s, *rest):
            cs = jax.tree_util.tree_unflatten(const_def, rest[:nc])
            inputs_s = rest[nc:]
            body = (fn if consts is None
                    else (lambda *xs: fn(*xs, cs)))
            return _compact_local(body, need_s, list(inputs_s), c)

        # check_vma=False: the chunk scan's lax.cond has a constant-zeros
        # false branch, which the varying-manual-axes checker rejects
        # against the device-varying true branch; the computation is
        # per-shard by construction, so the check adds nothing here.
        return jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(spec,) + (P(),) * nc + (spec,) * len(inputs),
            out_specs=spec, check_vma=False)(need, *const_leaves, *inputs)
    if consts is not None:
        return _compact_local(lambda *xs: fn(*xs, consts), need, inputs,
                              chunk)
    return _compact_local(fn, need, inputs, chunk)


def _compact_local(fn: Callable, need: jnp.ndarray,
                   inputs: Sequence[jnp.ndarray], chunk: int):
    n = need.shape[0]
    pad = (-n) % chunk
    if pad:
        need = jnp.concatenate([need, jnp.zeros((pad,), need.dtype)])
        inputs = [jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) for a in inputs]
    total = n + pad
    nchunks = total // chunk

    key = (~need).astype(jnp.int32)
    idx = jnp.arange(total, dtype=jnp.int32)
    _, sorted_arrs = _sort_by(key, [idx, *inputs])
    sidx, sinputs = sorted_arrs[0], sorted_arrs[1:]

    n_need = jnp.sum(need.astype(jnp.int32))
    starts = jnp.arange(nchunks, dtype=jnp.int32) * chunk

    out_shapes = jax.eval_shape(fn, *[
        jax.ShapeDtypeStruct((chunk,) + a.shape[1:], a.dtype)
        for a in sinputs])

    def zeros(*_):
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), out_shapes)

    # rematerialized body: WITHOUT remat, reverse-mode AD materializes the
    # scan's stacked cond residuals for every chunk — skipped chunks cost
    # as much as live ones in the backward and the whole point of the
    # compaction is lost (measured: grad-through-compact ran at dense
    # speed; with remat the backward replays the cond, taken branch only,
    # at ~2x forward cost on live chunks). Harmless for non-differentiated
    # uses (remat only changes AD).
    @jax.checkpoint
    def body(_, args):
        start, xc = args
        out = jax.lax.cond(start < n_need, fn, zeros, *xc)
        return None, out

    xs = tuple(a.reshape((nchunks, chunk) + a.shape[1:]) for a in sinputs)
    _, outs = jax.lax.scan(body, None, (starts, xs))
    outs = jax.tree_util.tree_map(
        lambda o: o.reshape((total,) + o.shape[2:]), outs)

    # restore original row order (second gather-free sort), zero ~need rows
    leaves, treedef = jax.tree_util.tree_flatten(outs)
    _, restored = _sort_by(sidx, leaves)
    restored = [jnp.where(need.reshape((-1,) + (1,) * (r.ndim - 1)), r,
                          jnp.zeros((), r.dtype))[:n]
                for r in restored]
    return jax.tree_util.tree_unflatten(treedef, restored)
