"""Reference HTML→text extractor.

The Go reference contains no extractor (it never touches HTML), so per
SURVEY.md §7 step 1 this module IS the reference extractor for the
north-rule per-row invariant: every pipeline stage must preserve
``text == extract_text(html)`` byte-for-byte through Arrow. It is a
deterministic pure function — version-pinned behavior, no locale or
wall-clock dependence:

  title + "\\n" + body, tags stripped, whitespace collapsed to single
  spaces, NFC-normalized UTF-8.

Keep this function frozen; changing it invalidates every stored text
column.
"""

from __future__ import annotations

import re
import unicodedata

_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.DOTALL)
_BODY_RE = re.compile(rb"<body>(.*?)</body>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")

EXTRACTOR_VERSION = 1


def extract_text(html: bytes) -> str:
    """Deterministic extraction: '<title>\\n<body text>' (see module doc)."""
    if html is None:
        return ""
    raw = bytes(html)
    tm = _TITLE_RE.search(raw)
    bm = _BODY_RE.search(raw)
    title = tm.group(1) if tm else b""
    body = bm.group(1) if bm else (b"" if tm else raw)
    parts = []
    for chunk in (title, body):
        text = chunk.decode("utf-8", errors="replace")
        text = _TAG_RE.sub(" ", text)
        text = _WS_RE.sub(" ", text).strip()
        parts.append(text)
    out = parts[0] + "\n" + parts[1] if parts[0] else parts[1]
    return unicodedata.normalize("NFC", out)
