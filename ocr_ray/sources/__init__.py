from ocr_ray.sources.readers import read_documents, read_table  # noqa: F401
