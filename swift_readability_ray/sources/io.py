"""Sources/sinks for the document tables (SURVEY.md §2.1).

Production target is Lance (BASELINE.json input_hint); this container has no
``lance`` package, so the adapter gates on an import-try and transparently
falls back to Parquet with an identical schema.  All readers return a lazy
``ray.data.Dataset`` whose blocks stream through the object store — no full
materialization.
"""

from __future__ import annotations

import os

import ray.data

try:  # pragma: no cover - lance is absent in this environment
    import lance  # type: ignore  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def _make_ipc_datasource():
    """Arrow IPC (Feather v2 / .arrows stream) file datasource.

    Ray ships no ``read_ipc``; this subclasses ``FileBasedDatasource`` so
    IPC files get the same streaming execution as every other source:
    one read task per file, record batches yielded incrementally (never
    the whole file as one block), zero-copy into the object store.
    Column pruning happens per batch before the block is emitted."""
    from ray.data.datasource import FileBasedDatasource

    class _ArrowIPC(FileBasedDatasource):
        _FILE_EXTENSIONS = ["arrow", "feather", "ipc", "arrows"]

        def __init__(self, paths, columns=None, **kwargs):
            super().__init__(paths, **kwargs)
            self._columns = columns

        def _open_input_source(self, filesystem, path, **open_args):
            # the random-access IPC (Feather v2) footer needs seek; the
            # default open_input_stream is forward-only
            return filesystem.open_input_file(path)

        def _read_stream(self, f, path: str):
            import pyarrow as pa
            import pyarrow.ipc as ipc

            try:  # random-access file format (Feather v2)
                reader = ipc.open_file(f)
                batches = (reader.get_batch(i)
                           for i in range(reader.num_record_batches))
            except pa.ArrowInvalid:  # stream format (.arrows)
                f.seek(0)
                batches = iter(ipc.open_stream(f))
            for rb in batches:
                t = pa.Table.from_batches([rb])
                yield t.select(self._columns) if self._columns else t

    return _ArrowIPC


def _make_orc_datasource():
    """ORC file datasource (Ray ships no ``read_orc``).

    One read task per file; stripes are yielded incrementally so a large
    ORC file never lands as one block.  Column pruning is pushed into the
    ORC stripe reader itself (``read_stripe(i, columns=...)``), so unneeded
    columns never leave storage — the same prune-at-the-read property the
    Parquet path gets from ``read_parquet(columns=...)``."""
    from ray.data.datasource import FileBasedDatasource

    class _Orc(FileBasedDatasource):
        _FILE_EXTENSIONS = ["orc"]

        def __init__(self, paths, columns=None, **kwargs):
            super().__init__(paths, **kwargs)
            self._columns = columns

        def _open_input_source(self, filesystem, path, **open_args):
            # the ORC footer/stripe index needs seek
            return filesystem.open_input_file(path)

        def _read_stream(self, f, path: str):
            import pyarrow.orc as orc

            import pyarrow as pa

            reader = orc.ORCFile(f)
            for i in range(reader.nstripes):
                rb = reader.read_stripe(i, columns=self._columns)
                yield pa.Table.from_batches([rb])

    return _Orc


def read_documents(path: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Read a documents table — format by extension: Lance (if the
    package is available), Parquet (default), Arrow IPC / Feather, ORC,
    CSV, or JSON-lines.

    ``columns`` prunes at the read for the columnar formats so only
    needed columns leave storage; the row-oriented formats (CSV/JSONL)
    must parse whole records, so pruning happens immediately after the
    read — still before anything crosses a shuffle.
    """
    if (path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))) and HAVE_LANCE:
        return ray.data.read_lance(path, columns=columns, **kwargs)
    if path.endswith((".arrow", ".feather", ".ipc", ".arrows")):
        return ray.data.read_datasource(
            _make_ipc_datasource()(path, columns=columns), **kwargs)
    if path.endswith(".orc"):
        return ray.data.read_datasource(
            _make_orc_datasource()(path, columns=columns), **kwargs)
    if path.endswith(".csv"):
        ds = ray.data.read_csv(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    if path.endswith((".jsonl", ".json")):
        ds = ray.data.read_json(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_table(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """Write a Dataset to a table directory — Lance if available, ORC by
    extension, else Parquet.  Every format writes one file per block via
    the streaming executor (never a single giant file)."""
    if HAVE_LANCE and path.endswith(".lance"):
        ds.write_lance(path, **kwargs)  # pragma: no cover
        return
    if path.endswith(".csv"):
        ds.write_csv(os.path.abspath(path), **kwargs)
        return
    if path.endswith(".jsonl"):
        # Ray's write_json emits one JSON-lines file per block already;
        # pandas does the row serialization in C (no per-row Python loop)
        ds.write_json(os.path.abspath(path), **kwargs)
        return
    if path.endswith(".orc"):
        # Ray ships no write_orc; map over blocks writing one ORC file per
        # block (same resumable one-file-per-block layout as write_parquet).
        # LOCAL paths only (pyarrow.orc.write_table opens the path
        # directly); resolved absolute on the DRIVER so worker cwd never
        # matters, and kwargs pass through to the ORC writer.
        out_dir = os.path.abspath(path)
        os.makedirs(out_dir, exist_ok=True)

        def _write(batch):
            import uuid

            import pyarrow as pa
            import pyarrow.orc as _orc

            fn = f"{out_dir}/block-{uuid.uuid4().hex}.orc"
            _orc.write_table(batch, fn, **kwargs)
            return pa.table({"path": pa.array([fn])})

        ds.map_batches(_write, batch_format="pyarrow",
                       batch_size=None).materialize()
        return
    ds.write_parquet(path, **kwargs)
