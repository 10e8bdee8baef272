"""PDF ingest — reference scripts/prepare_data.py:31
``extract_text_from_pdf`` re-expressed as a distributed binaryFile
scan + mapInPandas decode.

The real decode imports pypdf (or PyPDF2's modern PdfReader API) when
the wheel exists and extracts page texts joined with newlines —
prepare_data.py:31 parity. Where no codec is installed (this
container), ``decoder="auto"`` falls back to the deterministic fake
decoder (payload as utf-8 text, one page per form-feed), which keeps
every piece of Spark plumbing — the binaryFile source, Arrow batching,
the output schema — real and tested; ``decoder="real"`` raises
instead of silently degrading.

At scale: spark.read.format("binaryFile") distributes file reads
across executors (one task per file split set); decode is
embarrassingly parallel; downstream chunk/embed reuse the normal
operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_PDF_MOD = None
try:  # pragma: no cover - not in this container
    import pypdf as _PDF_MOD  # type: ignore  # noqa: F401
except ImportError:
    try:  # pragma: no cover
        import PyPDF2 as _PDF_MOD  # type: ignore  # noqa: F401
    except ImportError:
        _PDF_MOD = None

_HAVE_PDF = _PDF_MOD is not None and hasattr(_PDF_MOD, "PdfReader")


def extract_text_from_pdf(content: bytes) -> str:
    """Real decode path (prepare_data.py:31): page texts joined with
    newlines. Raises until a PDF library is installed."""
    if not _HAVE_PDF:
        raise NotImplementedError(
            "PDF decode requires pypdf/PyPDF2>=3 — not in this container; "
            "use pdf_to_documents(..., decoder='fake') for the tested "
            "plumbing path"
        )
    from io import BytesIO  # pragma: no cover - needs the wheel

    reader = _PDF_MOD.PdfReader(BytesIO(content))  # pragma: no cover
    return "\n".join(
        (page.extract_text() or "") for page in reader.pages
    )  # pragma: no cover


def _fake_extract(content: bytes) -> str:
    """Deterministic stand-in: payload is utf-8 text, form-feed as the
    page break (mirrors the real path's page-join-with-newline)."""
    return "\n".join(content.decode("utf-8", errors="replace").split("\x0c"))


def pdf_to_documents(
    spark: SparkSession, path_glob: str, decoder: str = "auto"
) -> DataFrame:
    """Distributed PDF → documents rows: binaryFile scan → mapInPandas
    decode → (path, text, n_chars).

    decoder: "auto" = real pypdf extraction when the wheel exists,
    fake utf-8/form-feed decode otherwise; "real" = require the wheel
    (raises without it); "fake" = force the deterministic stub."""
    if decoder == "auto":
        decoder = "real" if _HAVE_PDF else "fake"
    if decoder == "real" and not _HAVE_PDF:
        # fail at plan build, not wrapped inside a Python worker
        raise NotImplementedError(
            "decoder='real' requires pypdf/PyPDF2>=3 (not installed); "
            "use decoder='auto' to fall back to the fake codec"
        )
    extract = extract_text_from_pdf if decoder == "real" else _fake_extract
    files = spark.read.format("binaryFile").load(path_glob)

    def gen(batches):
        for pdf_batch in batches:
            texts = [extract(bytes(c)) for c in pdf_batch["content"]]
            yield pd.DataFrame(
                {
                    "path": pdf_batch["path"],
                    "text": texts,
                    "n_chars": [len(t) for t in texts],
                }
            )

    return files.select("path", "content").mapInPandas(
        gen, schema="path string, text string, n_chars long"
    )
