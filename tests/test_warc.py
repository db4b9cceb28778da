"""WARC source: record parsing, gzip-member handling, Ray read path, and
the pages-schema round-trip (the sf-gate additionally SQL-checks the full
fixture via the warc_ingest differential oracle)."""

import gzip

import pytest

from grawler_ray.sources.warc import parse_warc_bytes, read_warc, write_warc

RECS = [
    {
        "url": "http://site1.test/a",
        "warc_ts": 1_700_000_000_000_000,
        "html": b"<html><body>hello</body></html>",
        "status_code": 200,
        "content_type": "text/html",
    },
    {
        "url": "http://site2.test/b",
        "warc_ts": 1_700_000_060_000_000,
        "html": b"\xff\xfebinary junk",
        "status_code": 404,
        "content_type": "application/octet-stream",
    },
]


@pytest.mark.parametrize("gzipped", [True, False])
def test_roundtrip(tmp_path, gzipped):
    p = str(tmp_path / ("w.warc.gz" if gzipped else "w.warc"))
    write_warc(p, RECS, gzipped=gzipped)
    got = parse_warc_bytes(open(p, "rb").read())
    assert len(got) == 2
    for r, w in zip(got, RECS):
        assert r["url"] == w["url"]
        assert r["warc_ts"] == w["warc_ts"]
        assert r["html"] == w["html"]
        assert r["status_code"] == w["status_code"]
        assert r["content_type"] == w["content_type"]


def test_non_response_records_skipped(tmp_path):
    # hand-build a warcinfo record followed by one response
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    p = str(tmp_path / "w.warc")
    write_warc(p, RECS[:1], gzipped=False)
    data = info + open(p, "rb").read()
    got = parse_warc_bytes(data)
    assert len(got) == 1 and got[0]["url"] == RECS[0]["url"]


def test_content_type_normalized():
    body = b"x"
    http = (
        b"HTTP/1.1 301 Moved\r\nContent-Type: TEXT/Html; charset=UTF-8\r\n"
        b"Content-Length: 1\r\n\r\n" + body
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://h.test/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + f"Content-Length: {len(http)}\r\n\r\n".encode()
        + http
        + b"\r\n\r\n"
    )
    got = parse_warc_bytes(rec)
    # lowercased first token before ';' — the fetch-path rule
    assert got[0]["content_type"] == "text/html"
    assert got[0]["status_code"] == 301
    assert got[0]["html"] == body


def test_read_warc_dataset(ray_session, tmp_path):
    p1 = str(tmp_path / "a.warc.gz")
    p2 = str(tmp_path / "b.warc.gz")
    write_warc(p1, RECS[:1])
    write_warc(p2, RECS[1:])
    df = read_warc([p1, p2]).to_pandas().sort_values("url").reset_index(drop=True)
    assert list(df.url) == ["http://site1.test/a", "http://site2.test/b"]
    assert list(df.status_code) == [200, 404]
    assert bytes(df.html[0]) == RECS[0]["html"]


def test_compression_signals(ray_session):
    import ray.data

    from grawler_ray.functions.quality import compression_signals_batch

    docs = ray.data.from_items(
        [
            {"doc_id": 0, "text": "ab " * 500},   # highly compressible
            {"doc_id": 1, "text": ""},
            {"doc_id": 2, "text": "q7#x!"},
        ]
    )
    out = (
        docs.map_batches(compression_signals_batch, batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")
    )
    import zlib

    assert out.loc[0, "n_bytes"] == 1500
    assert out.loc[0, "n_compressed"] == len(zlib.compress(("ab " * 500).encode(), 6))
    assert out.loc[0, "ratio_permille"] < 100        # boilerplate compresses hard
    assert out.loc[1, "n_bytes"] == 0 and out.loc[1, "ratio_permille"] == 0
    assert out.loc[2, "ratio_permille"] > 1000       # tiny strings expand


def test_export_warc_round_trip(ray_session, tmp_path):
    """Distributed WARC export -> read_warc recovers every record exactly
    (url, ts, body bytes, status, content-type); re-running overwrites the
    same shard names (idempotent), never duplicates."""
    import os

    import ray.data

    from grawler_ray.sources.corpus import generate_corpus
    from grawler_ray.sources.warc import export_warc, read_warc

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_hosts=3, pages_per_host=6, seed=5, num_buckets=2)
    pages = ray.data.read_parquet(
        corpus, columns=["url", "warc_ts", "html", "status_code", "content_type"]
    )
    out = str(tmp_path / "warcs")
    man1 = export_warc(pages, out).to_pandas()
    assert man1.n_records.sum() == pages.count()

    back = read_warc(
        [os.path.join(out, f) for f in sorted(os.listdir(out))]
    ).to_pandas().sort_values("url").reset_index(drop=True)
    src = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert back.url.tolist() == src.url.tolist()
    assert back.html.tolist() == src.html.tolist()
    assert back.status_code.tolist() == src.status_code.astype("int32").tolist()
    assert back.content_type.tolist() == src.content_type.tolist()
    # warc_ts round-trips at WARC-Date's second resolution (ISO Zulu);
    # pandas 2.x keeps the parquet us unit on astype(int64)
    assert (back.warc_ts // 1_000_000
            == src.warc_ts.astype("int64") // 1_000_000).all()

    man2 = export_warc(pages, out).to_pandas()  # idempotent re-run
    assert sorted(man2.shard) == sorted(man1.shard)
    assert sorted(os.listdir(out)) == sorted(man1.shard.tolist())
