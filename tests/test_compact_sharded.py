"""Per-shard compaction under a device mesh (VERDICT r3 item 1).

The round-3 compaction (core/compact.py) sorted globally; under a sharded
batch that sort is a cross-device all-to-all. The shard_map path must:
  * match the dense computation exactly (the compaction is exact),
  * match the single-device (global-sort) compaction exactly,
  * insert NO collective ops — each device sorts/scans only its own rows,
  * propagate cotangents to closed-over (replicated) parameters exactly
    as the dense sharded computation would.

Reference behavior being re-expressed: hit-only boolean indexing in
``trace_radiance`` (implicit_differentiable_renderer.py:566-650) and the
octree's live-ray host loop (utils/octree.py:493-585).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robir_tpu.core.compact import compact_apply, effective_chunk, mesh_shards
from robir_tpu.core.mesh import batch_sharding, create_mesh, replicated

COLLECTIVES = ("all-to-all", "all-gather", "all-reduce", "collective-permute",
               "reduce-scatter")


def _mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return create_mesh(8)


def _fn(w):
    def fn(x, m):
        return {"y": jnp.tanh(x @ w) * m[:, None].astype(jnp.float32),
                "z": jnp.sum(x, axis=1)}
    return fn


class TestShardedCompact:
    def test_matches_dense_and_global(self):
        mesh = _mesh8()
        n, d, chunk = 256, 8, 16
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, d))
        need = jax.random.uniform(jax.random.PRNGKey(1), (n,)) < 0.3
        w = jax.random.normal(jax.random.PRNGKey(2), (d, d))
        fn = _fn(w)

        dense = fn(x, need)
        dense = {"y": jnp.where(need[:, None], dense["y"], 0.0),
                 "z": jnp.where(need, dense["z"], 0.0)}
        global_c = compact_apply(fn, need, [x, need], chunk)

        xs = jax.device_put(x, batch_sharding(mesh))
        ns = jax.device_put(need, batch_sharding(mesh))
        sharded = jax.jit(
            lambda a, b: compact_apply(fn, b, [a, b], chunk, mesh=mesh)
        )(xs, ns)

        for k in dense:
            np.testing.assert_allclose(np.asarray(sharded[k]),
                                       np.asarray(dense[k]), rtol=1e-6)
            np.testing.assert_array_equal(np.asarray(global_c[k]),
                                          np.asarray(dense[k]) * 0 +
                                          np.asarray(global_c[k]))
        # global-sort compaction is also exact vs dense
        for k in dense:
            np.testing.assert_allclose(np.asarray(global_c[k]),
                                       np.asarray(dense[k]), rtol=1e-6)

    def test_no_collectives_in_hlo(self):
        """The compaction region alone must compile to zero collectives."""
        mesh = _mesh8()
        n, d, chunk = 256, 8, 16
        w = jax.random.normal(jax.random.PRNGKey(2), (d, d))
        fn = _fn(w)

        sh = batch_sharding(mesh)

        def run(x, need):
            return compact_apply(fn, need, [x, need], chunk, mesh=mesh)

        lowered = jax.jit(run, in_shardings=(sh, sh), out_shardings=sh).lower(
            jax.ShapeDtypeStruct((n, d), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.bool_))
        hlo = lowered.compile().as_text().lower()
        for op in COLLECTIVES:
            assert op not in hlo, f"compaction path emitted a {op}"

    def test_global_sort_does_collective(self):
        """Sanity: the OLD global-sort path on sharded inputs does insert
        cross-device ops — the thing the shard_map path removes."""
        mesh = _mesh8()
        n, d, chunk = 256, 8, 16
        w = jax.random.normal(jax.random.PRNGKey(2), (d, d))
        fn = _fn(w)
        sh = batch_sharding(mesh)
        lowered = jax.jit(
            lambda x, need: compact_apply(fn, need, [x, need], chunk),
            in_shardings=(sh, sh), out_shardings=sh).lower(
            jax.ShapeDtypeStruct((n, d), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.bool_))
        hlo = lowered.compile().as_text().lower()
        assert any(op in hlo for op in COLLECTIVES)

    def test_grad_through_consts_matches_dense(self):
        """Cotangents of params routed through ``consts`` (the replicated
        P() operands) must equal the dense sharded grads — the
        replicated-operand transpose is a psum over shards."""
        mesh = _mesh8()
        n, d, chunk = 128, 4, 16
        x = jax.random.normal(jax.random.PRNGKey(0), (n, d))
        need = jax.random.uniform(jax.random.PRNGKey(1), (n,)) < 0.4
        w0 = jax.random.normal(jax.random.PRNGKey(2), (d, d))
        xs = jax.device_put(x, batch_sharding(mesh))
        ns = jax.device_put(need, batch_sharding(mesh))
        ws = jax.device_put(w0, replicated(mesh))

        def fn_c(x, m, w):
            return {"y": jnp.tanh(x @ w) * m[:, None].astype(jnp.float32)}

        def loss_compact(w, x, need):
            out = compact_apply(fn_c, need, [x, need], chunk, mesh=mesh,
                                consts=w)
            return jnp.sum(out["y"] ** 2)

        def loss_dense(w, x, need):
            out = fn_c(x, need, w)
            y = jnp.where(need[:, None], out["y"], 0.0)
            return jnp.sum(y ** 2)

        gc = jax.jit(jax.grad(loss_compact))(ws, xs, ns)
        gd = jax.jit(jax.grad(loss_dense))(ws, xs, ns)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gd),
                                   rtol=1e-5, atol=1e-6)

    def test_uneven_batch_falls_back(self):
        """n not divisible by shard count: global path, still exact."""
        mesh = _mesh8()
        n, d, chunk = 130, 4, 16
        x = jax.random.normal(jax.random.PRNGKey(0), (n, d))
        need = jax.random.uniform(jax.random.PRNGKey(1), (n,)) < 0.4
        w = jax.random.normal(jax.random.PRNGKey(2), (d, d))
        fn = _fn(w)
        out = compact_apply(fn, need, [x, need], chunk, mesh=mesh)
        dense = fn(x, need)
        np.testing.assert_allclose(
            np.asarray(out["y"]),
            np.asarray(jnp.where(need[:, None], dense["y"], 0.0)), rtol=1e-6)


class TestEffectiveChunk:
    def test_single_device_rule_unchanged(self):
        assert effective_chunk(256, 128) == 128
        assert effective_chunk(128, 128) == 0
        assert effective_chunk(256, 0) == 0

    def test_per_shard_gate(self):
        mesh = _mesh8()
        # per-shard 32 rows < 64: off (tiny shards not worth two sorts)
        assert effective_chunk(256, 128, mesh) == 0
        # per-shard 128 rows, chunk 128: auto-lowers to 64 (>=2 chunks/shard)
        assert effective_chunk(1024, 128, mesh) == 64
        # per-shard 512 rows > chunk: tuned chunk kept
        assert effective_chunk(4096, 128, mesh) == 128
        # uneven: behaves like unsharded
        assert effective_chunk(1023, 128, mesh) == 128

    def test_mesh_shards(self):
        mesh = _mesh8()
        assert mesh_shards(None) == 1
        assert mesh_shards(mesh) == 8
        assert mesh_shards(mesh, "nope") == 1
