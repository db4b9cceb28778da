"""CETR-style per-page main-content extraction (structural boilerplate
removal).

Weninger, Hu & Han, "CETR: Content Extraction via Tag Ratios" (WWW 2010)
— public algorithm.  The reference keeps ALL page text (src/crawler.go:290
walks the whole html.Parse tree), so navigation chrome, footers and link
farms land in the document sink verbatim; a 100-TB training-data pipeline
wants the article body.  This is the per-page STRUCTURAL complement to
``quality.line_dedup``'s corpus-level boilerplate strip (which needs the
same line to repeat across documents; CETR works on a single page).

Pinned deterministic variant (the executable spec for tests — the paper's
k-means clustering step is replaced by a mean threshold so the output is
reproducible and oracle-checkable):

1. strip comments, <script>/<style> subtrees (unterminated ones strip to
   EOF) and the doctype,
2. replace every tag token with a sentinel — newlines INSIDE a tag are
   removed with it, so a multi-line tag merges its source lines,
3. per line: x = collapsed-whitespace text length, t = tag count,
   ratio = x if t == 0 else x / t  (the paper's text-to-tag ratio),
4. smooth with a centered moving mean, window 2k+1, replicate-padded at
   the document edges,
5. keep lines with x > 0 whose smoothed ratio is >= the mean smoothed
   ratio over NON-BLANK lines (x > 0 or t > 0); ties keep (a uniform
   pure-text document keeps every line),
6. main text = kept lines' collapsed text joined with '\n'.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_COMMENT_RE = re.compile(r"<!--.*?(?:-->|\Z)", re.S)
_SCRIPT_RE = re.compile(r"<script\b.*?(?:</script\s*>|\Z)", re.S | re.I)
_STYLE_RE = re.compile(r"<style\b.*?(?:</style\s*>|\Z)", re.S | re.I)
_DOCTYPE_RE = re.compile(r"<!doctype[^>]*>", re.I)
# [^>] matches newlines (multi-line tags); a truncated tag at EOF counts
# as a tag here — CETR is a ratio heuristic, not the parity tokenizer
# (htmlparse keeps truncated tags as text; documented divergence there)
_TAG_RE = re.compile(r"<[^>]*>|<[^>]*\Z")
_WS_RE = re.compile(r"\s+")
_SENTINEL = "\x01"


def cetr_profile(html: str, k: int = 2):
    """Per-line CETR profile: (texts, x, t, smoothed_ratio, keep_mask).

    ``texts`` are the collapsed-whitespace tag-free line texts; ``x``
    their lengths; ``t`` tag counts; ``keep_mask`` the pinned selection
    rule of the module docstring.
    """
    cleaned = _COMMENT_RE.sub("", html)
    cleaned = _SCRIPT_RE.sub("", cleaned)
    cleaned = _STYLE_RE.sub("", cleaned)
    cleaned = _DOCTYPE_RE.sub("", cleaned)
    cleaned = _TAG_RE.sub(_SENTINEL, cleaned)
    lines = cleaned.split("\n")
    texts = []
    t = np.empty(len(lines), np.int64)
    for i, ln in enumerate(lines):
        t[i] = ln.count(_SENTINEL)
        texts.append(_WS_RE.sub(" ", ln.replace(_SENTINEL, " ")).strip())
    x = np.array([len(s) for s in texts], np.int64)
    ratio = np.where(t == 0, x.astype(np.float64), x / np.maximum(t, 1))
    # centered moving mean, window 2k+1, REPLICATE padding at the edges
    # (zero padding punishes document-edge content lines; clipped means
    # invert the signal on short documents) — cumsum keeps it vectorized
    n = len(ratio)
    if n == 0:
        return texts, x, t, ratio, np.zeros(0, bool)
    padded = np.concatenate(
        [np.full(k, ratio[0]), ratio, np.full(k, ratio[-1])]
    )
    cs = np.concatenate(([0.0], np.cumsum(padded)))
    idx = np.arange(n)
    smoothed = (cs[idx + 2 * k + 1] - cs[idx]) / (2 * k + 1)
    nonblank = (x > 0) | (t > 0)
    thr = float(smoothed[nonblank].mean()) if nonblank.any() else 0.0
    keep = (x > 0) & (smoothed >= thr)
    return texts, x, t, smoothed, keep


def extract_main_text(html: str, k: int = 2) -> str:
    """The kept lines' text, '\\n'-joined ('' for empty/boilerplate-only
    pages)."""
    texts, _, _, _, keep = cetr_profile(html, k=k)
    return "\n".join(s for s, m in zip(texts, keep) if m)


def main_content(
    pages_ds,
    html_col: str = "html",
    url_col: str = "url",
    k: int = 2,
):
    """Dataset stage: (url, total_lines, kept_lines, main_chars,
    main_text) per page.

    Scale shape: embarrassingly parallel map — no shuffle, payloads read
    once and reduced to the extracted text.  The kernel is per-document
    Python by nature (regex walk, like the HTML parse kernels) and
    batch-wrapped; bytes decode utf-8/replace — feed
    ``textops.decode_page`` output first when charset sniffing matters.
    """

    def kernel(tbl: pa.Table) -> pa.Table:
        urls = tbl.column(url_col).to_pylist()
        bodies = tbl.column(html_col).to_pylist()
        total = np.empty(len(urls), np.int64)
        kept = np.empty(len(urls), np.int64)
        chars = np.empty(len(urls), np.int64)
        out_text = []
        for i, body in enumerate(bodies):
            if isinstance(body, (bytes, bytearray, memoryview)):
                body = bytes(body).decode("utf-8", errors="replace")
            texts, x, _, _, keep = cetr_profile(body or "", k=k)
            total[i] = len(texts)
            kept[i] = int(keep.sum())
            main = "\n".join(s for s, m in zip(texts, keep) if m)
            chars[i] = len(main)
            out_text.append(main)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "total_lines": pa.array(total, pa.int64()),
                "kept_lines": pa.array(kept, pa.int64()),
                "main_chars": pa.array(chars, pa.int64()),
                "main_text": pa.array(out_text, pa.string()),
            }
        )

    return pages_ds.map_batches(kernel, batch_format="pyarrow")
