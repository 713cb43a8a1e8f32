"""Pytree path utilities: filtering, merging, partial restore.

These are the TPU-native replacement for the reference's cross-stage
checkpoint "surgery" done by state-dict key filtering (e.g. keeping only
``normal_decoder_layer`` keys, reference ``training/train_pbr.py:157-159``,
or splitting a Vis checkpoint by key prefix, ``train_pbr.py:195-203``).
Here parameters are nested dicts and surgery is explicit path filtering.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp

Params = Any  # nested dict pytree of jnp arrays


def flatten_with_paths(tree: Params, sep: str = "/") -> dict[str, jnp.ndarray]:
    """Flatten a nested dict into {'a/b/c': leaf} form."""
    out: dict[str, jnp.ndarray] = {}

    def rec(prefix: str, node: Any) -> None:
        if isinstance(node, Mapping):
            for k in sorted(node.keys()):
                rec(f"{prefix}{sep}{k}" if prefix else str(k), node[k])
        else:
            out[prefix] = node

    rec("", tree)
    return out


def unflatten_paths(flat: Mapping[str, Any], sep: str = "/") -> Params:
    """Inverse of :func:`flatten_with_paths`."""
    tree: dict[str, Any] = {}
    for path, leaf in flat.items():
        parts = path.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def filter_tree(tree: Params, pred: Callable[[str], bool]) -> Params:
    """Keep only leaves whose path satisfies ``pred``."""
    flat = flatten_with_paths(tree)
    return unflatten_paths({k: v for k, v in flat.items() if pred(k)})


def keep_prefixes(tree: Params, prefixes: tuple[str, ...]) -> Params:
    """Keep subtrees under the given top-level path prefixes."""
    return filter_tree(tree, lambda p: any(p == q or p.startswith(q + "/") for q in prefixes))


def drop_prefixes(tree: Params, prefixes: tuple[str, ...]) -> Params:
    return filter_tree(tree, lambda p: not any(p == q or p.startswith(q + "/") for q in prefixes))


def merge_trees(base: Params, override: Params) -> Params:
    """Non-strict partial restore: leaves present in ``override`` replace those
    in ``base``; everything else keeps the ``base`` value.

    Equivalent of the reference's ``load_state_dict(..., strict=False)`` after
    key filtering.
    """
    flat = flatten_with_paths(base)
    over = flatten_with_paths(override)
    unknown = set(over) - set(flat)
    if unknown:
        raise KeyError(f"override contains paths not in base: {sorted(unknown)[:5]} ...")
    flat.update(over)
    return unflatten_paths(flat)


def tree_size_bytes(tree: Params) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(x.size * x.dtype.itemsize for x in leaves)


def to_plain(tree: Any) -> Any:
    """Convert an arbitrary pytree (dicts, NamedTuples, lists, tuples,
    optax states) into nested plain dicts with string keys, so it can be
    path-flattened and serialized. Scalars/arrays stay as leaves."""
    if isinstance(tree, Mapping):
        return {str(k): to_plain(v) for k, v in tree.items()}
    if hasattr(tree, "_fields"):  # NamedTuple
        return {k: to_plain(getattr(tree, k)) for k in tree._fields}
    if isinstance(tree, (list, tuple)):
        return {str(i): to_plain(v) for i, v in enumerate(tree)}
    return tree


def from_plain(exemplar: Any, plain: Any) -> Any:
    """Rebuild a pytree with ``exemplar``'s structure from :func:`to_plain`
    output (inverse of to_plain given a structural template)."""
    if isinstance(exemplar, Mapping):
        return type(exemplar)(
            {k: from_plain(v, plain[str(k)]) for k, v in exemplar.items()})
    if hasattr(exemplar, "_fields"):
        return type(exemplar)(
            *[from_plain(getattr(exemplar, k), plain[k]) for k in exemplar._fields])
    if isinstance(exemplar, (list, tuple)):
        vals = [from_plain(v, plain[str(i)]) for i, v in enumerate(exemplar)]
        return type(exemplar)(vals)
    if exemplar is None:
        return None
    return jnp.asarray(plain)


def tangent_space(n: "jnp.ndarray"):
    """Orthonormal tangent frame per normal (reference
    ``utils/utils.py:20-38``): rotate n 90 degrees about x, cross twice,
    normalize with 1e-4 clamps. n: [..., 3] -> (b, c) each [..., 3]."""
    rot = jnp.asarray([[1.0, 0.0, 0.0],
                       [0.0, 0.0, -1.0],
                       [0.0, 1.0, 0.0]], dtype=n.dtype)
    a = jnp.einsum("ij,...j->...i", rot, n)
    b = jnp.cross(a, n)
    c = jnp.cross(b, n)
    b = b / jnp.clip(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-4, None)
    c = c / jnp.clip(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-4, None)
    return b, c
