from ocr_ray.pipelines.extract import extract_documents, extract_spans_flat  # noqa: F401
