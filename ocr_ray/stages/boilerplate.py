"""Boilerplate strip — the flagship per-record filter stage.

The analogue of a per-record filter EDT in the reference (every EDT body
is a per-datum map/filter, ``/root/reference/inc/ocr-edt.h:166-178``):
drop ``kind == 'boilerplate'`` spans with one vectorized Arrow predicate.
Offset re-indexing happens downstream at reassembly (offsets are a sort
key until then, so filtering need not renumber here).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ocr_ray.schema import KIND_BOILERPLATE


def strip_boilerplate(batch: pa.Table) -> pa.Table:
    """Remove boilerplate spans from an exploded span batch."""
    if batch.num_rows == 0:
        return batch
    return batch.filter(pc.not_equal(batch["kind"], KIND_BOILERPLATE))
