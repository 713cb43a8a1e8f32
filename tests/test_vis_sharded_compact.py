"""Sharded Vis step with per-shard compaction (VERDICT r3 item 1 "done").

Round 3 pinned shard_fan + compaction mutually exclusive (the global
compaction sort would all-to-all the fan the sharding just distributed).
The per-shard shard_map compaction composes: these tests run the REAL Vis
train step on the 8-device mesh with compaction ON and assert

  * its losses match the dense (compaction-off) sharded step — the fan
    compaction (borrow_color at contributing rays only) and the grid-march
    liveness compaction are exact, so this is an allclose at fp tolerance;
  * the compaction adds no cross-device collective: the compacted step's
    HLO contains no all-to-all / collective-permute, and no more
    all-gathers/all-reduces than the dense step already has (grad psums).

Reference: trace_radiance hit-only indexing
(implicit_differentiable_renderer.py:566-650); octree live-ray loop
(utils/octree.py:493-585).
"""

import dataclasses
import re

import jax
import numpy as np
import pytest

from robir_tpu.core.mesh import MeshConfig, batch_sharding, create_mesh
from robir_tpu.data.syn_dataset import SynDataset, SynDatasetConfig
from robir_tpu.data.synthetic import make_sphere_dataset
from robir_tpu.fields.envmap_material import EnvmapMaterialConfig
from robir_tpu.fields.neus_model import NeuSConfig
from robir_tpu.fields.radiance import RenderingConfig
from robir_tpu.fields.sdf import SDFConfig
from robir_tpu.fields.visibility import IndirIllumConfig, VisNetConfig
from robir_tpu.render.color import ToneMapConfig
from robir_tpu.render.stage2 import Stage2Config
from robir_tpu.stages.stage2_runner import StageOptConfig, init_stage2_params
from robir_tpu.stages.vis import VisRunner, VisStageConfig
from robir_tpu.tracing.grid import GridConfig, grid_cast

pytestmark = [pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 devices"),
              pytest.mark.slow]


def _count(hlo: str, op: str) -> int:
    return len(re.findall(rf"\b{op}", hlo))


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    scene_dir = str(tmp_path_factory.mktemp("syn"))
    make_sphere_dataset(scene_dir, n_train=4, n_test=1, h=32, w=32,
                        radius=0.5)
    dataset = SynDataset(SynDatasetConfig(instance_dir=scene_dir))
    cfg = Stage2Config(
        neus=NeuSConfig(
            sdf=SDFConfig(d_out=17, d_hidden=16, n_layers=2, skip_in=(),
                          multires=2, bias=0.5),
            color=RenderingConfig(d_feature=16, d_hidden=16, n_layers=2)),
        envmap=EnvmapMaterialConfig(multires=2, num_lgt_sgs=8,
                                    encoder_dims=(16,), decoder_dims=(16,)),
        indirect=IndirIllumConfig(multires=2, dims=(16, 16), num_lgt_sgs=4),
        visnet=VisNetConfig(points_multires=2, dirs_multires=2,
                            dims=(16, 16)),
        tonemap=ToneMapConfig(hdr_mode=2),
        grid=GridConfig(resolution=32, bbox_min=(-0.45,) * 3,
                        bbox_max=(0.45,) * 3))
    params = init_stage2_params(jax.random.PRNGKey(0), cfg)
    return dataset, cfg, params


def _runner(dataset, cfg, params, mesh, fan_chunk, grid_chunk, seed=3):
    cfg = dataclasses.replace(cfg, grid=dataclasses.replace(
        cfg.grid, compact_chunk=grid_chunk))
    r = VisRunner(cfg, params, dataset,
                  VisStageConfig(num_pixels=64, nsamp=32,
                                 opt=StageOptConfig(lr=1e-3),
                                 shard_fan=True,
                                 fan_compact_chunk=fan_chunk),
                  mesh=mesh, seed=seed)
    r.bake_grid()
    return r


def test_vis_step_sharded_compact_matches_dense(setup):
    dataset, cfg, params = setup
    mesh = create_mesh(MeshConfig())

    compacted = _runner(dataset, cfg, params, mesh, fan_chunk=64,
                        grid_chunk=256)
    dense = _runner(dataset, cfg, params, mesh, fan_chunk=0, grid_chunk=0)

    # same seed => identical batches and step keys
    with mesh:
        mc = compacted.run(1, log_every=1)
        md = dense.run(1, log_every=1)
    for k in ("radiance_loss", "visibility_loss"):
        np.testing.assert_allclose(mc[k], md[k], rtol=2e-4, atol=1e-6), k

    # a couple more steps: stays finite and in lockstep with dense
    with mesh:
        mc = compacted.run(3, log_every=1)
        md = dense.run(3, log_every=1)
    np.testing.assert_allclose(mc["visibility_loss"], md["visibility_loss"],
                               rtol=2e-3, atol=1e-5)


def test_vis_step_compaction_adds_no_collectives(setup):
    dataset, cfg, params = setup
    mesh = create_mesh(MeshConfig())

    compacted = _runner(dataset, cfg, params, mesh, fan_chunk=64,
                        grid_chunk=256)
    dense = _runner(dataset, cfg, params, mesh, fan_chunk=0, grid_chunk=0)

    def step_hlo(r):
        b = r._batch()
        with mesh:
            lowered = r._step.lower(r._vis, r._illum, r._frozen,
                                    r.vis_state, r.illum_state,
                                    r.grid_values, b, r.next_key())
            return lowered.compile().as_text().lower()

    hc = step_hlo(compacted)
    hd = step_hlo(dense)

    # the global-sort signature ops must be entirely absent
    assert _count(hc, "all-to-all") == 0
    assert _count(hc, "collective-permute") == 0
    # and compaction must not add gather/reduce collectives beyond what
    # the dense sharded step already has (grad psums, fan boundaries)
    for op in ("all-gather", "all-reduce", "reduce-scatter"):
        assert _count(hc, op) <= _count(hd, op), (
            op, _count(hc, op), _count(hd, op))


def test_grid_cast_sharded_compact_bitexact(setup):
    """Per-shard march-tail/refine compaction is bit-exact vs the dense
    march on sharded rays."""
    dataset, cfg, params = setup
    mesh = create_mesh(MeshConfig())
    from robir_tpu.render.stage2 import Stage2Model
    model = Stage2Model(params, cfg)
    from robir_tpu.tracing.grid import build_sdf_grid
    grid = build_sdf_grid(model.sdf, cfg.grid)

    key = jax.random.PRNGKey(7)
    o = jax.random.normal(key, (512, 3)) * 0.1 + np.array([0.0, 0.0, -1.0])
    d = np.array([0.0, 0.0, 1.0]) + 0.3 * jax.random.normal(
        jax.random.PRNGKey(8), (512, 3))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)

    cfg_c = dataclasses.replace(cfg.grid, compact_chunk=64, compact_after=4)
    cfg_d = dataclasses.replace(cfg.grid, compact_chunk=0)

    os = jax.device_put(np.asarray(o), batch_sharding(mesh))
    ds = jax.device_put(np.asarray(d), batch_sharding(mesh))
    t_c, hit_c, x_c = jax.jit(
        lambda o, d: grid_cast(grid, cfg_c, o, d, mesh=mesh))(os, ds)
    t_d, hit_d, x_d = jax.jit(
        lambda o, d: grid_cast(grid, cfg_d, o, d))(np.asarray(o),
                                                   np.asarray(d))
    np.testing.assert_array_equal(np.asarray(hit_c), np.asarray(hit_d))
    # head lengths differ (compact_after=4 vs full-width march), so the
    # bisection/Newton refine sees brackets a few ulp apart
    np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_d),
                               rtol=1e-5, atol=1e-5)


def test_vis_step_sharded_quad_layout(setup):
    """The prebaked quad-row lookup buffer (2-D grid_values) rides the
    per-shard compaction consts under the mesh: losses match the 4-row
    sharded step at fp tolerance and no collective appears beyond the
    dense step's (quad is bit-exact, so this is the sharding analog of
    test_quad_rows_matches_grid_sdf)."""
    dataset, cfg, params = setup
    mesh = create_mesh(MeshConfig())

    rows = _runner(dataset, cfg, params, mesh, fan_chunk=64,
                   grid_chunk=256)
    qcfg = dataclasses.replace(cfg, grid=dataclasses.replace(
        cfg.grid, quad_rows=True))
    quad = _runner(dataset, qcfg, params, mesh, fan_chunk=64,
                   grid_chunk=256)
    assert quad.grid_values.ndim == 2  # prebaked host-side

    with mesh:
        mr = rows.run(2, log_every=1)
        mq = quad.run(2, log_every=1)
    for k in ("radiance_loss", "visibility_loss"):
        np.testing.assert_allclose(mq[k], mr[k], rtol=2e-4, atol=1e-6), k

    b = quad._batch()
    with mesh:
        lowered = quad._step.lower(quad._vis, quad._illum, quad._frozen,
                                   quad.vis_state, quad.illum_state,
                                   quad.grid_values, b, quad.next_key())
        hq = lowered.compile().as_text().lower()
    assert _count(hq, "all-to-all") == 0
    assert _count(hq, "collective-permute") == 0
