"""Pipeline stages: per-batch Arrow transforms and stateful actor stages.

Each stage is either a pure function over a ``pyarrow.Table`` batch (the
analogue of a stateless EDT body in the reference,
``/root/reference/inc/ocr-edt.h:166-178``) or a callable class run as a
Ray Data actor pool (the analogue of per-worker TLS state,
``/root/reference/src/comp-platform/pthread/pthread-comp-platform.c:125-157``).
"""

from ocr_ray.stages.explode import explode_documents, implode_spans  # noqa: F401
from ocr_ray.stages.boilerplate import strip_boilerplate  # noqa: F401
from ocr_ray.stages.normalize import normalize_spans  # noqa: F401
from ocr_ray.stages.glyphs import GlyphCodec, Recognizer, segment_payloads  # noqa: F401
from ocr_ray.stages.assemble import reassemble, reassemble_bucket  # noqa: F401
