"""In-memory Lance-like dataset fakes for the source-reader tests.

The ``lance`` package is absent in this environment, so the streaming
fragment-read path (``sources.readers._read_lance_fragments``) is
exercised against these stand-ins, which mirror the minimal surface the
reader uses: ``module.dataset(path)`` -> ``.get_fragments()`` /
``.get_fragment(id)`` -> ``fragment.to_table(columns=...)``. They live in
the package (not in tests/) because Ray worker processes must be able to
import the class when unpickling the read closure.
"""

from __future__ import annotations

import pyarrow as pa


class FakeFragment:
    def __init__(self, fid: int, table: pa.Table):
        self.fragment_id = fid
        self._table = table

    def to_table(self, columns=None) -> pa.Table:
        return self._table.select(columns) if columns else self._table


class FakeLanceDataset:
    def __init__(self, fragments: list[FakeFragment]):
        self._fragments = {f.fragment_id: f for f in fragments}

    def get_fragments(self):
        return list(self._fragments.values())

    def get_fragment(self, fid: int) -> FakeFragment:
        return self._fragments[fid]


class FakeLanceModule:
    """Stands in for the ``lance`` module object in readers tests."""

    def __init__(self, fragments: list[FakeFragment]):
        self._ds = FakeLanceDataset(fragments)

    def dataset(self, path) -> FakeLanceDataset:
        return self._ds


class FakeLanceWriterModule(FakeLanceModule):
    """Adds the write surface the ResumableSink Lance branch uses
    (``lance.write_dataset(table, path)`` creating a dataset DIRECTORY).
    The fake materializes the table as one parquet file inside the dir so
    tests can read fragments back without the real package."""

    def __init__(self, fragments: list[FakeFragment] | None = None):
        super().__init__(fragments or [])
        self.write_calls: list[str] = []

    def write_dataset(self, table: pa.Table, path) -> None:
        import os

        import pyarrow.parquet as pq

        os.makedirs(str(path), exist_ok=False)
        pq.write_table(table, os.path.join(str(path), "data-0.pq"))
        self.write_calls.append(str(path))

    def dataset_table(self, path) -> pa.Table:
        import os

        import pyarrow.parquet as pq

        return pq.read_table(os.path.join(str(path), "data-0.pq"))
