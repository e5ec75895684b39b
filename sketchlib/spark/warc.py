"""WARC (ISO 28500) source — read Common-Crawl-style archives directly.

The north-star corpus ships as WARC, not parquet; this reader turns
WARC *response* records into the pages schema ``(url, warc_ts, html,
text, lang)`` with no external library:

* one ``binaryFile`` scan row per archive — an archive is the natural
  task granularity for web crawls (Common Crawl segments are ~1 GB),
  so scan parallelism = number of archives, no shuffle;
* a streaming record parser inside ``mapInPandas`` (Arrow-batched,
  never per-row Python over records' tokens);
* text extraction reuses the frozen ``sketchlib.textx`` extractor, so
  the per-row byte-identity invariant (text == extract_text(html))
  holds for WARC inputs exactly as it does for parquet.

Both plain and whole-file-gzip archives are handled (magic-byte
sniff); malformed regions resync to the next ``WARC/`` marker instead
of failing the archive.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_CRLF2 = b"\r\n\r\n"


def iter_warc_records(blob: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per WARC record; headers keys are
    lowercase. Skips garbage between records (resync on ``WARC/``) and
    truncated tails — a crawler's archive is allowed to end mid-write."""
    i, n = 0, len(blob)
    while i < n:
        if not blob.startswith(b"WARC/", i):
            j = blob.find(b"WARC/", i)
            if j < 0:
                return
            i = j
        hdr_end = blob.find(_CRLF2, i)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for ln in blob[i:hdr_end].decode("utf-8", "replace").split("\r\n")[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            # clamp: a negative Content-Length (corrupt/malicious) would
            # move the cursor backward and loop forever on one record
            clen = max(int(headers.get("content-length", "0")), 0)
        except ValueError:
            clen = 0
        start = hdr_end + 4
        if start + clen > n:
            return  # truncated record
        yield headers, blob[start : start + clen]
        i = start + clen
        while i < n and blob.startswith(b"\r\n", i):
            i += 2


def http_body(payload: bytes) -> bytes:
    """Body of the HTTP message carried by a response record."""
    sep = payload.find(_CRLF2)
    return payload[sep + 4 :] if sep >= 0 else payload


def read_warc(spark, path: str):
    """→ DataFrame(PAGES_SCHEMA) of every WARC *response* record under
    ``path`` (file, glob, or directory of .warc / .warc.gz)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..textx import extract_text

        for pdf in batches:
            urls: list = []
            tss: list = []
            htmls: list = []
            texts: list = []
            langs: list = []
            for content in pdf["content"]:
                blob = bytes(content)
                if blob[:2] == b"\x1f\x8b":
                    blob = gzip.decompress(blob)
                for headers, payload in iter_warc_records(blob):
                    if headers.get("warc-type") != "response":
                        continue  # warcinfo/request/metadata records
                    html = http_body(payload)
                    urls.append(headers.get("warc-target-uri"))
                    tss.append(pd.to_datetime(headers.get("warc-date"), utc=True))
                    htmls.append(html)
                    texts.append(extract_text(html))
                    langs.append(
                        headers.get("warc-identified-content-language")
                    )
            out = pd.DataFrame(
                {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
            )
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True).dt.tz_localize(None)
            yield out

    files = spark.read.format("binaryFile").load(path)
    return files.select("content").mapInPandas(parse, PAGES_SCHEMA)
