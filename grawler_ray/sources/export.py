"""Export sinks: the documents/words views re-materialized as parquet /
JSONL / CSV directories (S5-adjacent — the reference can only sink to
couchbase; downstream training stacks want files).  Streaming writes via the
native Ray Data datasinks; no driver materialization."""

from __future__ import annotations

import ray.data

_FORMATS = ("parquet", "json", "csv")


def export_dataset(ds: "ray.data.Dataset", dest: str, format: str = "parquet") -> None:
    if format == "parquet":
        ds.write_parquet(dest)
    elif format == "json":  # JSONL, one object per line
        ds.write_json(dest)
    elif format == "csv":
        ds.write_csv(dest)
    else:
        raise ValueError(f"unknown export format {format!r} (one of {_FORMATS})")


def read_export(dest: str, format: str = "parquet") -> "ray.data.Dataset":
    if format == "parquet":
        return ray.data.read_parquet(dest)
    if format == "json":
        return ray.data.read_json(dest)
    if format == "csv":
        return ray.data.read_csv(dest)
    raise ValueError(f"unknown export format {format!r} (one of {_FORMATS})")


def export_documents(out_dir: str, dest: str, format: str = "parquet") -> None:
    """Crawl documents view -> files (streaming)."""
    from ..pipelines.crawl import read_documents

    export_dataset(read_documents(out_dir), dest, format)


def export_words(out_dir: str, dest: str, format: str = "parquet") -> None:
    from ..pipelines.crawl import read_words

    export_dataset(read_words(out_dir), dest, format)
