import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robir_tpu.core import checkpoint as ckpt
from robir_tpu.core import schedule as sched
from robir_tpu.core import tree as treelib
from robir_tpu.core.mesh import MeshConfig, create_mesh, shard_batch


def _params():
    return {
        "sdf": {"lin0": {"v": jnp.ones((3, 4)), "g": jnp.ones((4,))}},
        "envmap": {"lgtSGs": jnp.zeros((8, 7))},
        "normal_decoder": {"w": jnp.full((2, 2), 3.0)},
    }


class TestTree:
    def test_flatten_roundtrip(self):
        p = _params()
        flat = treelib.flatten_with_paths(p)
        assert "sdf/lin0/v" in flat
        back = treelib.unflatten_paths(flat)
        assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(back)

    def test_keep_drop(self):
        p = _params()
        kept = treelib.keep_prefixes(p, ("normal_decoder",))
        assert list(kept.keys()) == ["normal_decoder"]
        dropped = treelib.drop_prefixes(p, ("normal_decoder",))
        assert "normal_decoder" not in dropped and "sdf" in dropped

    def test_merge_partial(self):
        p = _params()
        override = {"envmap": {"lgtSGs": jnp.ones((8, 7))}}
        merged = treelib.merge_trees(p, override)
        assert float(merged["envmap"]["lgtSGs"].sum()) == 56.0
        assert float(merged["normal_decoder"]["w"][0, 0]) == 3.0

    def test_merge_unknown_path_raises(self):
        with pytest.raises(KeyError):
            treelib.merge_trees(_params(), {"nope": jnp.zeros(1)})


class TestCheckpoint:
    def test_save_load(self, tmp_path):
        p = _params()
        path = str(tmp_path / "c.npz")
        ckpt.save(path, p, step=7, extra={"stage": "pbr"})
        loaded, meta = ckpt.load(path)
        assert meta["step"] == 7 and meta["extra"]["stage"] == "pbr"
        np.testing.assert_array_equal(loaded["normal_decoder"]["w"], np.full((2, 2), 3.0))

    def test_surgical_restore(self, tmp_path):
        """Cross-stage surgery: restore only normal_decoder from a Norm ckpt
        into a fresh PBR model (reference train_pbr.py:157-159 semantics)."""
        norm_params = _params()
        norm_params["normal_decoder"]["w"] = jnp.full((2, 2), 9.0)
        path = str(tmp_path / "norm.npz")
        ckpt.save(path, norm_params, step=100)

        fresh = _params()
        restored, meta = ckpt.restore_into(
            fresh, path, keep=lambda p: p.startswith("normal_decoder"))
        assert float(restored["normal_decoder"]["w"][0, 0]) == 9.0
        assert float(restored["envmap"]["lgtSGs"].sum()) == 0.0

    def test_latest(self, tmp_path):
        d = str(tmp_path)
        assert ckpt.latest_path(d) is None
        for s in (10, 200, 30):
            ckpt.save(ckpt.step_path(d, s), _params(), step=s)
        assert ckpt.latest_path(d).endswith("ckpt_000200.npz")


class TestSchedule:
    def test_linear(self):
        fn = sched.from_config(("linear", 1.0, 0.0, 100))
        assert float(fn(0)) == 1.0
        assert float(fn(50)) == pytest.approx(0.5)
        assert float(fn(1000)) == 0.0

    def test_exponential(self):
        fn = sched.from_config({"type": "exponential", "initial_value": 1.0,
                                "final_value": 0.01, "num_steps": 101})
        assert float(fn(0)) == pytest.approx(1.0)
        assert float(fn(200)) == pytest.approx(0.01)

    def test_scalar_is_constant(self):
        fn = sched.from_config(0.3)
        assert float(fn(12345)) == pytest.approx(0.3)

    def test_log_lerp_matches_reference(self):
        """Oracle: reference learning_rate_decay (neus/misc/math.py:91-124)."""
        lr_init, lr_final, max_steps, delay, mult = 5e-4, 5e-6, 200_000, 2500, 0.01
        fn = sched.log_lerp_lr(lr_init, lr_final, max_steps, delay, mult)
        for step in [0, 100, 2500, 50_000, 200_000]:
            if delay > 0:
                delay_rate = mult + (1 - mult) * np.sin(
                    0.5 * np.pi * np.clip(step / delay, 0, 1))
            else:
                delay_rate = 1.0
            t = np.clip(step / max_steps, 0, 1)
            want = delay_rate * np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
            assert float(fn(step)) == pytest.approx(float(want), rel=1e-5)

    def test_piecewise(self):
        fn = sched.from_config(("piecewise", [(10, ("constant", 1.0)),
                                             (10, ("linear", 1.0, 0.0, 10))]))
        assert float(fn(5)) == 1.0
        assert float(fn(15)) == pytest.approx(0.5)


class TestMesh:
    def test_eight_device_mesh(self):
        mesh = create_mesh(MeshConfig())
        assert mesh.devices.size == 8  # conftest forces 8 CPU devices

    def test_shard_batch(self):
        mesh = create_mesh(MeshConfig())
        batch = {"rays": jnp.zeros((64, 3))}
        out = shard_batch(mesh, batch)
        shard_shapes = [s.data.shape for s in out["rays"].addressable_shards]
        assert all(s == (8, 3) for s in shard_shapes)


def test_tangent_space_parity():
    """Oracle: reference utils/utils.py:20-38 tangent_space."""
    from robir_tpu.core.tree import tangent_space
    from tests.conftest import has_reference
    rng = np.random.default_rng(9)
    n = rng.standard_normal((20, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    b, c = tangent_space(jnp.asarray(n))
    # orthogonal frame
    assert np.abs(np.sum(np.asarray(b) * n, -1)).max() < 1e-5
    assert np.abs(np.sum(np.asarray(c) * n, -1)).max() < 1e-5
    if has_reference():
        from tests.ref_loader import import_reference_module, patch_torch_cpu
        patch_torch_cpu()
        import torch
        uu = import_reference_module("utils.utils")
        wb, wc = uu.tangent_space(torch.from_numpy(n))
        np.testing.assert_allclose(np.asarray(b), wb.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c), wc.numpy(), rtol=1e-4, atol=1e-5)
