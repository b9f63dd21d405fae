"""Stage registry: the engine's user-extension surface.

Mirrors the reference's pluggable job handlers — ``registerHandler(tipo,
handler)`` + dispatch by type (src/services/job-queue.service.js:19-21,
193-199; workers self-register in constructors,
src/workers/previsacion.worker.js:13-16). Here a "stage" is a named
map_batches callable (function or actor class) plus its default kwargs;
pipelines are built from a config list of stage names, so a user can add a
route/extractor/normalizer without touching engine code.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import ray.data as rd


@dataclass
class StageSpec:
    fn: Callable | type
    batch_format: str = "pyarrow"
    default_kwargs: dict[str, Any] = field(default_factory=dict)
    is_actor: bool = False


_REGISTRY: dict[str, StageSpec] = {}


def register_stage(
    name: str,
    fn: Callable | type,
    batch_format: str = "pyarrow",
    is_actor: bool = False,
    **default_kwargs: Any,
) -> None:
    if name in _REGISTRY:
        raise ValueError(f"stage {name!r} already registered")
    _REGISTRY[name] = StageSpec(fn, batch_format, default_kwargs, is_actor)


def get_stage(name: str) -> StageSpec:
    if name not in _REGISTRY:
        raise KeyError(f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_stages() -> list[str]:
    return sorted(_REGISTRY)


def apply_stage(ds: "rd.Dataset", name: str, **overrides: Any) -> "rd.Dataset":
    spec = get_stage(name)
    kwargs = dict(spec.default_kwargs)
    kwargs.update(overrides)
    map_kwargs: dict[str, Any] = {"batch_format": spec.batch_format}
    for k in ("batch_size", "concurrency", "num_cpus", "zero_copy_batch"):
        if k in kwargs:
            map_kwargs[k] = kwargs.pop(k)
    if spec.is_actor:
        map_kwargs.setdefault("concurrency", 2)  # callable classes require a pool size
        return ds.map_batches(spec.fn, fn_constructor_kwargs=kwargs, **map_kwargs)
    if kwargs:
        fn = spec.fn

        def bound(batch, _fn=fn, _kw=kwargs):
            return _fn(batch, **_kw)

        return ds.map_batches(bound, **map_kwargs)
    return ds.map_batches(spec.fn, **map_kwargs)


def build_pipeline(ds: "rd.Dataset", stages: list[str | tuple[str, dict]]) -> "rd.Dataset":
    """Build a pipeline from a config list: ["sniff", ("extract", {...})]."""
    for stage in stages:
        if isinstance(stage, tuple):
            name, overrides = stage
            ds = apply_stage(ds, name, **overrides)
        else:
            ds = apply_stage(ds, stage)
    return ds


def _register_builtins() -> None:
    from medical_ocr_service_ray.stages.extract import TurnExtractor
    from medical_ocr_service_ray.stages.multimodal import MediaDecoderStub, sniff_media_batch
    from medical_ocr_service_ray.stages.text import (
        fingerprint_batch,
        lang_id_batch,
        quality_batch,
        token_stats_batch,
    )

    register_stage("extract_turns", TurnExtractor, is_actor=True, zero_copy_batch=False)
    register_stage("token_stats", token_stats_batch, zero_copy_batch=True)
    register_stage("lang_id", lang_id_batch, zero_copy_batch=True)
    register_stage("quality", quality_batch, zero_copy_batch=True)
    register_stage("fingerprints", fingerprint_batch, zero_copy_batch=True)
    register_stage("sniff_media", sniff_media_batch, batch_size=16)
    register_stage("decode_media", MediaDecoderStub, is_actor=True, batch_size=16)


_register_builtins()
