"""ocr_ray — a Ray-Data-native data-processing / extraction engine.

A brand-new engine (not a port) covering the capabilities of the reference
runtime ``pombreda/ocr`` (Open Community Runtime v0.8, an event-driven
task-dataflow runtime; see SURVEY.md), re-expressed as idiomatic Ray Data
pipelines over zero-copy Arrow batches:

- data model: interleaved text+media documents
  ``(doc_id: string, spans: large_list<struct<kind, text, media_ref, offset>>)``
  (``ocr_ray.schema``), the exploded per-span form between stages;
- flagship pipeline: main-content extraction — boilerplate strip, glyph
  decode + segmentation + nearest-template recognition (actor pool),
  reading-order reassembly via a ``groupby(doc_id)`` shuffle
  (``ocr_ray.pipelines.extract``);
- a library of relational / dedup / similarity / text-analysis operators
  over Arrow batches (``ocr_ray.functions``), surfaced as the ``queries()``
  registry in ``__ray_entry__``;
- checkpoint manifests + per-partition lineage & metrics (``ocr_ray.state``).

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — sessions
are owned by the driver, ``bench.py`` and the test fixture.
"""

__version__ = "0.1.0"
