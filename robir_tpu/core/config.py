"""Unified config system.

The reference mixes three config systems — pyhocon ``.conf`` for stage 2,
gin for stage 1, and mutable module globals (``confs_sg/env_path.py``) as a
hidden side channel (SURVEY.md 5.6). Here one JSON config tree (with //
comments and CLI dotted overrides) feeds explicit frozen-dataclass configs;
there are no import-time globals.
"""

from __future__ import annotations

import dataclasses
import json
import re
from typing import Any

from ..fields.envmap_material import EnvmapMaterialConfig
from ..fields.neus_model import NeuSConfig, VarianceConfig
from ..fields.radiance import NeRFBgConfig, RenderingConfig
from ..fields.sdf import SDFConfig
from ..fields.visibility import IndirIllumConfig, VisNetConfig
from ..render.color import ToneMapConfig
from ..render.neus import NeusRenderConfig
from ..render.stage2 import Stage2Config
from ..tracing.grid import GridConfig
from ..tracing.sphere import SphereTracerConfig


def load_config(path: str) -> dict:
    """JSON with // line comments."""
    with open(path) as f:
        text = f.read()
    text = re.sub(r"^\s*//.*$", "", text, flags=re.M)
    return json.loads(text)


def apply_overrides(cfg: dict, overrides: list[str]) -> dict:
    """Apply 'a.b.c=value' CLI overrides (values parsed as JSON, falling
    back to string)."""
    for ov in overrides:
        path, _, raw = ov.partition("=")
        try:
            value = json.loads(raw)
        except json.JSONDecodeError:
            value = raw
        node = cfg
        keys = path.strip().split(".")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value
    return cfg


def _build(dc_type, d: dict | None, **extra):
    """Construct a frozen dataclass from a dict, tolerating missing keys
    (defaults apply) and rejecting unknown ones."""
    d = dict(d or {})
    d.update(extra)
    names = {f.name for f in dataclasses.fields(dc_type)}
    unknown = set(d) - names
    if unknown:
        raise KeyError(f"unknown {dc_type.__name__} keys: {sorted(unknown)}")
    # tuples for list-typed fields
    kwargs = {k: tuple(v) if isinstance(v, list) else v for k, v in d.items()}
    return dc_type(**kwargs)


def build_neus_config(d: dict) -> NeuSConfig:
    bg = d.get("background")
    return NeuSConfig(
        sdf=_build(SDFConfig, d.get("sdf")),
        color=_build(RenderingConfig, d.get("color")),
        variance=_build(VarianceConfig, d.get("variance")),
        background=_build(NeRFBgConfig, bg) if bg is not None else None,
        radius=d.get("radius", 2.0))


def build_neus_render_config(d: dict) -> NeusRenderConfig:
    return _build(NeusRenderConfig, d)


def build_stage1_configs(cfg_dict: dict):
    """Stage-1 dispatch from config: (model_type, render_type, model_cfg,
    render_cfg). Mirrors the reference's gin bindings ``Trainer.model_class``
    (trainer.py:39-48) and ``render`` (interface.py:37-40).

    model.type: "neus" (default) | "hash" | "vnerf";
    render.type: "neus" (default; forced "mip" for vnerf)."""
    model_d = dict(cfg_dict.get("model", {}))
    render_d = dict(cfg_dict.get("render", {}))
    model_type = model_d.pop("type", "neus")
    render_type = render_d.pop("type",
                               "mip" if model_type == "vnerf" else "neus")

    if model_type == "neus":
        # a unified pipeline config may nest the NeuS fields under
        # model.neus (the stage-2 layout); accept both
        src = (model_d["neus"] if "neus" in model_d and "sdf" not in model_d
               else model_d)
        model_cfg = build_neus_config(src)
    elif model_type == "hash":
        from ..fields.hashgrid import HashGridConfig, HashSDFConfig
        from ..fields.neus_model import HashNeuSConfig
        hs = dict(model_d.get("hash_sdf", {}))
        grid = hs.pop("grid", None)
        model_cfg = HashNeuSConfig(
            hash_sdf=_build(HashSDFConfig, hs,
                            **({"grid": _build(HashGridConfig, grid)}
                               if grid is not None else {})),
            color=_build(RenderingConfig, model_d.get("color")),
            variance=_build(VarianceConfig, model_d.get("variance")),
            radius=model_d.get("radius", 2.0))
    elif model_type == "vnerf":
        from ..fields.vnerf import VNeRFConfig
        model_cfg = _build(VNeRFConfig, model_d)
    else:
        raise KeyError(f"unknown stage-1 model.type {model_type!r}")

    if render_type == "neus":
        render_cfg = _build(NeusRenderConfig, render_d)
    elif render_type == "mip":
        from ..render.mip import MipRenderConfig
        render_cfg = _build(MipRenderConfig, render_d)
    else:
        raise KeyError(f"unknown stage-1 render.type {render_type!r}")
    return model_type, render_type, model_cfg, render_cfg


def build_stage2_config(d: dict) -> Stage2Config:
    return Stage2Config(
        neus=build_neus_config(d.get("neus", {})),
        envmap=_build(EnvmapMaterialConfig, d.get("envmap_material_network")),
        indirect=_build(IndirIllumConfig, d.get("indirect_illum_network")),
        visnet=_build(VisNetConfig, d.get("visibility_network")),
        tonemap=_build(ToneMapConfig, d.get("tonemap")),
        grid=_build(GridConfig, d.get("grid")),
        coord_scale=d.get("coord_scale", 2.0),
        bgr=d.get("bgr", False),
        vis_compute_dtype=d.get("vis_compute_dtype"),
        sweep_light_chunk=d.get("sweep_light_chunk", 0),
        use_neus=d.get("use_neus", True),
        tracer=d.get("tracer", "grid"),
        sphere_tracer=_build(SphereTracerConfig, d.get("sphere_tracer")))


def build_stage_config(dc_type, d: dict | None):
    """Build a stage config dataclass, constructing nested opt/loss configs
    from plain dicts."""
    from ..stages.losses import IllumLossConfig, InvLossConfig
    from ..stages.stage2_runner import StageOptConfig

    d = dict(d or {})
    if isinstance(d.get("opt"), dict):
        d["opt"] = _build(StageOptConfig, d["opt"])
    if isinstance(d.get("loss"), dict):
        kind = (IllumLossConfig if dc_type.__name__ == "VisStageConfig"
                else InvLossConfig)
        d["loss"] = _build(kind, d["loss"])
    return _build(dc_type, d)


def config_to_dict(obj: Any) -> Any:
    """Dataclass tree -> plain dict (for run-dir snapshots, the equivalent
    of the reference's conf copy, train_normal.py:74-75)."""
    if dataclasses.is_dataclass(obj):
        return {f.name: config_to_dict(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [config_to_dict(x) for x in obj]
    return obj
