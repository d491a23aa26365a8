"""Deterministic HTML → text extraction.

The reference has no HTML handling (it hashes raw file bytes); the driver's
``input_hint`` adds the invariant that extracted ``text`` is byte-identical
per ``url`` across runs and parallelism levels (BASELINE.json:16).  The
extractor is therefore a pure function of the ``html`` bytes: decode UTF-8,
take everything between the first ``<p>`` and the last ``</p>``, and strip
any remaining tags with one compiled regex.  No heuristics, no libraries
beyond the baked-in polars fast path, no ordering dependence.

Runs as a stateless ``map_batches`` stage (patterns compiled at module
import, shared by every task on a worker process).  The hot path is one
vectorized polars extract + replace_all pass over the whole batch; the
pure-Python loop is only the no-polars fallback.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

try:
    import polars as _pl
except ImportError:  # pragma: no cover - polars is baked in
    _pl = None

_TAG = re.compile(rb"<[^>]*>")
_BODY = re.compile(rb"<p>(.*)</p>", re.S)


def _extract_one(html: bytes) -> str:
    m = _BODY.search(html)
    body = m.group(1) if m else b""
    return _TAG.sub(b"", body).decode("utf-8")


def extract_text(batch: pa.Table, *, html_col: str = "html",
                 out_col: str = "extracted_text") -> pa.Table:
    """Append ``out_col`` extracted from ``html_col`` (deterministic)."""
    col = batch[html_col].combine_chunks()
    if _pl is not None:
        # cast binary→string validates utf-8 without copying the payload
        s = _pl.from_arrow(pc.cast(col, pa.large_string()))
        body = s.str.extract(r"(?s)<p>(.*)</p>", 1).fill_null("")
        texts = (body.str.replace_all(r"<[^>]*>", "")
                 .to_arrow().cast(pa.string()))
    else:  # pragma: no cover - polars is baked in
        texts = pa.array([_extract_one(h) for h in col.to_pylist()],
                         type=pa.string())
    return batch.append_column(out_col, texts)
