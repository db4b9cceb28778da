"""PDF text extraction (S8, utils.ReadPdfFromBytes src/utils/utils.go:100-121).

Unreachable in the reference pipeline: ``documentAllowed`` admits only
text/html and text/plain (src/crawler.go:275), so the PDF branch never runs.
Kept for API parity behind an import-try — this container ships no PDF
library, so the real path raises and the deterministic fake supports testing
the plumbing (mirrors stages/multimodal.py's stub pattern).
"""

from __future__ import annotations


def read_pdf_from_bytes(b: bytes, fake: bool = False) -> str:
    """Page-concatenated plain text of a PDF body."""
    if fake:
        # deterministic stand-in: pretend each 1 KiB is a page marker
        return " ".join(f"page{i}" for i in range(max(1, len(b) // 1024)))
    try:
        import pypdf  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "no PDF library in this environment; pass fake=True for plumbing "
            "tests or plug pypdf/pdfminer here"
        ) from e
    raise NotImplementedError("wire the installed PDF library here")
