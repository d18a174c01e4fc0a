"""Stage registry — the engine's user-extension surface.

The reference exposes extension through a *factory/module system*: every
subsystem is a named factory selected by an INI string
(``/root/reference/src/machine-description/ocr-machine-description.c:216-460``,
``create_factory`` dispatch ``:422-460``) and user compute enters as EDT
function pointers (``/root/reference/inc/ocr-edt.h:177``). Here the same
surface is a name -> StageSpec registry:

- ``@stage("name")`` registers a per-batch transform (pure function) or a
  stateful actor class (``stateful=True`` -> actor pool via
  ``map_batches(cls, concurrency=...)``);
- ``apply_stage(ds, name, **overrides)`` instantiates it on a Dataset with
  config-file or call-site overrides (the INI "instance" section analogue);
- shuffle-shaped stages (reassembly) register with ``kind='shuffle'`` and
  receive the Dataset itself, since they are not a single map_batches.

``ocr_ray.pipelines.builder`` drives this registry from a YAML/JSON spec —
the machine-description analogue (SURVEY.md §2.3 row 25).
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Callable

import ray.data


@dataclass(frozen=True)
class StageSpec:
    name: str
    fn: Callable[..., Any]
    kind: str = "map"  # 'map' (per-batch) | 'shuffle' (takes/returns Dataset)
    stateful: bool = False  # actor pool when True (fn is a callable class)
    batch_format: str = "pyarrow"
    creates_ids: bool = False  # emits rows with NEW doc_ids (resume-unsafe)
    defaults: dict[str, Any] = field(default_factory=dict)

    def describe(self) -> str:
        doc = inspect.getdoc(self.fn) or ""
        return doc.splitlines()[0] if doc else ""


_REGISTRY: dict[str, StageSpec] = {}


class UnknownStageError(KeyError):
    """Raised for a stage name absent from the registry (the analogue of the
    reference's MustFailRun arity tests — misconfiguration fails loudly)."""


def stage(
    name: str,
    *,
    kind: str = "map",
    stateful: bool = False,
    batch_format: str = "pyarrow",
    creates_ids: bool = False,
    **defaults: Any,
):
    """Decorator: register a transform under ``name``. Re-registration
    replaces (user code can override a builtin by name)."""

    def deco(fn):
        _REGISTRY[name] = StageSpec(
            name=name,
            fn=fn,
            kind=kind,
            stateful=stateful,
            batch_format=batch_format,
            creates_ids=creates_ids,
            defaults=dict(defaults),
        )
        return fn

    return deco


def register(name: str, fn: Callable, **kwargs: Any) -> None:
    """Imperative registration (same as the decorator)."""
    stage(name, **kwargs)(fn)


def get_stage(name: str) -> StageSpec:
    _ensure_builtins()
    try:
        return _REGISTRY[name]
    except KeyError:
        raise UnknownStageError(
            f"unknown stage {name!r}; known: {sorted(_REGISTRY)}"
        ) from None


def list_stages() -> dict[str, str]:
    """{name: one-line description} of everything registered."""
    _ensure_builtins()
    return {n: s.describe() for n, s in sorted(_REGISTRY.items())}


def apply_stage(ds: ray.data.Dataset, name: str, **overrides: Any) -> ray.data.Dataset:
    """Instantiate one registered stage on a Dataset.

    For ``kind='map'``: engine knobs (``batch_size``, ``concurrency``,
    ``num_cpus``) pass through to ``map_batches``; everything else becomes
    a transform kwarg (``fn_kwargs`` for functions, constructor kwargs for
    stateful classes). For ``kind='shuffle'``: all kwargs go to the stage
    function, which composes its own groupby.
    """
    spec = get_stage(name)
    params = {**spec.defaults, **overrides}
    if spec.kind == "shuffle":
        return spec.fn(ds, **params)
    engine_keys = ("batch_size", "concurrency", "num_cpus", "memory")
    engine = {k: params.pop(k) for k in engine_keys if k in params}
    if isinstance(engine.get("concurrency"), list):  # YAML/JSON lists -> tuple
        engine["concurrency"] = tuple(engine["concurrency"])
    if spec.stateful:
        engine.setdefault("concurrency", 2)
        return ds.map_batches(
            spec.fn,
            batch_format=spec.batch_format,
            fn_constructor_kwargs=params,
            **engine,
        )
    return ds.map_batches(
        spec.fn, batch_format=spec.batch_format, fn_kwargs=params, **engine
    )


_BUILTINS_LOADED = False


def _ensure_builtins() -> None:
    """Register the engine's builtin stages on first use (import-cycle-free)."""
    global _BUILTINS_LOADED
    if _BUILTINS_LOADED:
        return
    _BUILTINS_LOADED = True

    from ocr_ray.stages.assemble import reassemble, reassemble_two_phase
    from ocr_ray.stages.boilerplate import strip_boilerplate
    from ocr_ray.stages.explode import explode_documents
    from ocr_ray.stages.glyphs import Recognizer
    from ocr_ray.stages.media import MediaDecoder, attach_payloads
    from ocr_ray.stages.normalize import normalize_spans

    stage("explode")(explode_documents)
    stage("normalize")(normalize_spans)
    stage("recognize", stateful=True)(Recognizer)
    stage("strip_boilerplate")(strip_boilerplate)
    stage("reassemble", kind="shuffle")(reassemble)
    stage("reassemble_two_phase", kind="shuffle")(reassemble_two_phase)
    stage("attach_media_payloads")(attach_payloads)
    stage("media_decode", stateful=True, fake_decode=True)(MediaDecoder)

    from ocr_ray.functions.dedup import add_content_hash, simhash, with_mutants
    from ocr_ray.functions.text import lang_id, quality_score, token_stats, token_windows
    from ocr_ray.stages.media import media_frame_sample, media_resize

    stage("content_hash")(add_content_hash)
    stage("simhash")(simhash)
    stage("with_mutants", creates_ids=True)(with_mutants)
    stage("token_stats")(token_stats)
    stage("quality_score")(quality_score)
    stage("lang_id")(lang_id)
    stage("token_windows")(token_windows)
    stage("media_resize")(media_resize)
    stage("media_frame_sample")(media_frame_sample)

    from ocr_ray.functions.text import pii_augment, pii_redact, repetition_stats

    stage("repetition_stats")(repetition_stats)
    stage("pii_augment")(pii_augment)
    stage("pii_redact")(pii_redact)

    from ocr_ray.functions.relational import bucketed_aggregate

    stage("bucketed_aggregate", kind="shuffle")(bucketed_aggregate)

    # Web/layout extraction legs (north-rule surfaces): fixture attach +
    # parser stages, so spec-driven pipelines can compose e.g.
    # attach_span_warc -> extract_warc_spans without Python code.
    from ocr_ray.stages.html import (
        HtmlMainExtractor,
        HtmlSpanExtractor,
        attach_html_payloads,
        attach_span_html_payloads,
    )
    from ocr_ray.stages.pdf import (
        PdfSpanExtractor,
        PdfTextExtractor,
        attach_pdf_payloads,
        attach_span_pdf_payloads,
    )
    from ocr_ray.stages.warc import (
        WarcMainExtractor,
        WarcSpanExtractor,
        attach_span_warc_payloads,
        attach_warc_payloads,
    )

    stage("attach_html")(attach_html_payloads)
    stage("attach_span_html")(attach_span_html_payloads)
    stage("attach_pdf")(attach_pdf_payloads)
    stage("attach_span_pdf")(attach_span_pdf_payloads)
    stage("attach_warc")(attach_warc_payloads)
    stage("attach_span_warc")(attach_span_warc_payloads)
    stage("extract_html_main", stateful=True)(HtmlMainExtractor)
    stage("extract_html_spans", stateful=True)(HtmlSpanExtractor)
    stage("extract_pdf_text", stateful=True)(PdfTextExtractor)
    stage("extract_pdf_spans", stateful=True)(PdfSpanExtractor)
    stage("extract_warc_main", stateful=True)(WarcMainExtractor)
    stage("extract_warc_spans", stateful=True)(WarcSpanExtractor)

    from ocr_ray.stages.mixed import MixedSpanExtractor, attach_mixed_payloads

    stage("attach_mixed")(attach_mixed_payloads)
    stage("extract_mixed_spans", stateful=True)(MixedSpanExtractor)
