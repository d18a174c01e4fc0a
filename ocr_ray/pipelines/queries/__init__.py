"""Query registry package: one module per operator family.

Importing this package populates ``QUERY_FNS`` / ``ORACLE_SQL`` by
importing every section module in the original registration order,
so registry contents are identical to the former single-file module.
"""

from ocr_ray.pipelines.queries._shared import (  # noqa: F401
    ORACLE_SQL,
    QUERY_FNS,
    _big_spenders,
    load_small_table,
    query,
)

from ocr_ray.pipelines.queries.extract import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.relational_agg import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.relational_joins import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.setops_window import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.text_analysis import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.dedup import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.simsearch import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.media import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.dedup_cluster import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.ranking_reshape import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.curation import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.multijoin import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.tpch2 import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.retrieval import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.analytics2 import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.weblayout import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.formats_io import *  # noqa: F401,F403
from ocr_ray.pipelines.queries.timeseries import *  # noqa: F401,F403
