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
