from ocr_ray.sources.formats import (  # noqa: F401
    read_csv_dir,
    read_ipc,
    read_jsonl_gz,
    read_orc,
    write_csv_dir,
    write_ipc,
    write_jsonl_gz,
    write_orc,
)
from ocr_ray.sources.readers import (  # noqa: F401
    read_any,
    read_documents,
    read_table,
    write_documents,
)
from ocr_ray.sources.tfrecord import read_tfrecord, write_tfrecord  # noqa: F401
from ocr_ray.sources.webdataset import (  # noqa: F401
    read_webdataset,
    write_webdataset,
)
