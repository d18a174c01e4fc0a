from ocr_ray.state.manifest import (  # noqa: F401
    ResumableSink,
    load_manifest,
    write_extracted_resumable,
)
