from ocr_ray.pipelines.extract import (  # noqa: F401
    extract_and_write,
    extract_documents,
    extract_spans_flat,
)
from ocr_ray.pipelines.builder import build_pipeline, load_spec, run_pipeline  # noqa: F401
