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


def read_documents(path: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Read a documents table (Lance if available/URI, else Parquet).

    ``columns`` prunes at the read so only needed columns leave storage.
    """
    if (path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))) and HAVE_LANCE:
        return ray.data.read_lance(path, columns=columns, **kwargs)
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_table(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """Write a Dataset to a table directory (Lance if available, else Parquet)."""
    if HAVE_LANCE and path.endswith(".lance"):
        ds.write_lance(path, **kwargs)  # pragma: no cover
        return
    ds.write_parquet(path, **kwargs)
