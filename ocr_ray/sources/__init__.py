from ocr_ray.sources.readers import (  # noqa: F401
    read_any,
    read_documents,
    read_table,
    write_documents,
)
