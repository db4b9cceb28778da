"""WARC ingestion: read Common-Crawl-style WARC files into the engine's
pages schema (url, warc_ts, html, status_code, content_type).

The reference fetches live HTTP (src/crawler.go:96) and has no archive
ingestion; at 100 TB the corpus arrives as WARC segments (the public
Common Crawl layout), so this is the missing source edge.  Format per the
public WARC 1.0 / ISO 28500 spec: records are
``WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<block>\\r\\n\\r\\n``; *response*
records carry an HTTP message as the block.  Gzipped WARCs use one gzip
MEMBER per record, so a plain full-stream decompress recovers the
concatenation — which is exactly how this reader handles ``.gz`` paths
(stdlib ``gzip``; no external warc library in this container, and none
needed).

Ray shape: ``read_binary_files`` (one task per WARC segment — segments are
~1 GiB at Common Crawl, a good block size) -> one vectorized-per-file
``flat_map``-style ``map_batches`` parse emitting the pages schema.  The
parse is per-record by necessity (WARC is a sequential record format) but
each record's work is bounded header scanning + zero-copy ``memoryview``
slicing of the payload; downstream stages are the same Arrow pipelines the
parquet corpus feeds.
"""

from __future__ import annotations

import gzip
from datetime import datetime, timezone

import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


def _parse_warc_headers(raw: bytes) -> dict:
    headers: dict[str, str] = {}
    for line in raw.split(b"\r\n")[1:]:  # [0] is the WARC/1.0 version line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("ascii", "replace").lower()] = v.strip().decode(
                "ascii", "replace"
            )
    return headers


def _warc_ts_us(iso: str) -> int:
    """WARC-Date (ISO 8601 Zulu) -> epoch microseconds; 0 when absent/bad."""
    try:
        return int(
            datetime.strptime(iso, "%Y-%m-%dT%H:%M:%SZ")
            .replace(tzinfo=timezone.utc)
            .timestamp()
            * 1_000_000
        )
    except (ValueError, TypeError):
        return 0


def _parse_http_block(block: bytes) -> tuple[int, str, bytes]:
    """HTTP response message -> (status_code, content_type, body)."""
    sep = block.find(_CRLF2)
    if sep < 0 or not block.startswith(b"HTTP/"):
        return 0, "", bytes(block)
    head = block[:sep]
    body = bytes(block[sep + 4 :])
    lines = head.split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = 0
    ctype = ""
    for line in lines[1:]:
        if line.lower().startswith(b"content-type:"):
            # same normalization as the fetch path: lowercased first token
            # before ';' (src/crawler.go:257)
            ctype = (
                line.split(b":", 1)[1].strip().split(b";")[0].decode("ascii", "replace").lower()
            )
            break
    return status, ctype, body


def parse_warc_bytes(data: bytes) -> list[dict]:
    """All *response* records of one WARC file (plain or member-gzipped)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    out = []
    view = memoryview(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        headers = _parse_warc_headers(bytes(view[pos:hdr_end]))
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break  # unrecoverable: cannot find the next record boundary
        block_start = hdr_end + 4
        block = view[block_start : block_start + length]
        pos = block_start + length
        if headers.get("warc-type") == "response":
            status, ctype, body = _parse_http_block(bytes(block))
            out.append(
                {
                    "url": headers.get("warc-target-uri", ""),
                    "warc_ts": _warc_ts_us(headers.get("warc-date", "")),
                    "html": body,
                    "status_code": status,
                    "content_type": ctype,
                }
            )
    return out


def read_warc(paths, concurrency: int | None = None):
    """WARC segment paths -> Dataset(url, warc_ts:int64 epoch-us,
    html:binary, status_code:int32, content_type:string)."""
    import ray.data

    def parse(t: pa.Table) -> pa.Table:
        rows = []
        for data in t.column("bytes").to_pylist():
            rows.extend(parse_warc_bytes(data))
        return pa.table(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.int64()),
                "html": pa.array([r["html"] for r in rows], pa.binary()),
                "status_code": pa.array([r["status_code"] for r in rows], pa.int32()),
                "content_type": pa.array([r["content_type"] for r in rows], pa.string()),
            }
        )

    ds = ray.data.read_binary_files(paths)
    kw = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1, **kw)


def write_warc(path: str, records: list[dict], gzipped: bool = True) -> None:
    """Test/fixture writer: records are dicts with url, warc_ts (epoch us),
    html (bytes), status_code, content_type.  One gzip member per record
    when ``gzipped`` (the Common Crawl layout)."""
    chunks = []
    for r in records:
        ts = datetime.fromtimestamp(r["warc_ts"] / 1e6, tz=timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        )
        body = r["html"]
        http = (
            f"HTTP/1.1 {r['status_code']} OK\r\n"
            f"Content-Type: {r['content_type']}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        rec = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode() + http + b"\r\n\r\n"
        chunks.append(gzip.compress(rec) if gzipped else rec)
    with open(path, "wb") as f:
        f.write(b"".join(chunks))


def export_warc(ds, out_dir: str, gzipped: bool = True):
    """Distributed WARC export — the hand-off symmetric to ``read_warc``:
    one ``.warc[.gz]`` segment per BLOCK (streaming, no driver
    materialization), shard names derived from the block's first URL +
    row count so a re-run overwrites its own shards idempotently instead
    of duplicating them.  Input needs the pages schema columns (url,
    warc_ts us-timestamp or int64, html binary, status_code,
    content_type); returns a tiny (shard, n_records) table.

    Why: every archive-pipeline neighbor (Common Crawl tooling, warcio
    consumers) ingests WARC; a crawl engine that can only re-read its own
    parquet is a silo.  Round-trip equality with read_warc is pinned in
    tests/test_warc.py.
    """
    import os

    from ..urlops import xxhash64_batch

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzipped else ".warc"

    out_schema = pa.schema(
        [pa.field("shard", pa.string()), pa.field("n_records", pa.int64())]
    )

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        ts = t.column("warc_ts")
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("us")).cast(pa.int64())
        recs = [
            {
                "url": u,
                "warc_ts": int(w),
                "html": b if b is not None else b"",
                "status_code": int(s),
                "content_type": c or "",
            }
            for u, w, b, s, c in zip(
                t.column("url").to_pylist(),
                ts.to_pylist(),
                t.column("html").to_pylist(),
                t.column("status_code").to_pylist(),
                t.column("content_type").to_pylist(),
            )
        ]
        tag = int(xxhash64_batch([recs[0]["url"]])[0])
        name = f"shard-{tag:016x}-{t.num_rows}{ext}"
        write_warc(os.path.join(out_dir, name), recs, gzipped)
        return pa.table(
            {
                "shard": pa.array([name], pa.string()),
                "n_records": pa.array([t.num_rows], pa.int64()),
            }
        )

    return ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)
