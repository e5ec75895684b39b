"""Deterministic synthetic Common-Crawl-style web pages.

Generates the ``input_hint`` table shape from BASELINE.json —
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)
— per the spec in FIXTURES.md §1: Zipf-skewed hosts (exercises the
salting path), LogNormal body lengths, Zipf token draws, ~1% exact
duplicate pages under distinct urls, and the per-row invariant
``text == extract_text(html)`` by construction.

Everything is seeded (PCG64) — same (seed, n) always yields identical
bytes, which the checkpoint/resume and merge-associativity tests rely
on. No wall clock, no global RNG.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .textx import extract_text

EPOCH_2026 = np.datetime64("2026-01-01T00:00:00")

_EDGE_BODIES = {
    0: b"",  # empty body
    1: b"x",  # 1-byte body
    2: b"z" * 10_000,  # 10 KB body
    3: "héllo wörld".encode(),  # non-ASCII (hash_fnv_test.go:50)
}


def _zipf_bounded(rng: np.random.Generator, a: float, n: int, bound: int) -> np.ndarray:
    z = rng.zipf(a, n)
    return (z - 1) % bound


def generate_documents(
    n: int,
    seed: int = 42,
    num_hosts: int = 1000,
    vocab: int = 50_000,
    dup_rate: float = 0.01,
) -> pa.Table:
    """Build an n-row web-pages table (pyarrow, ready for parquet/Spark)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    hosts = _zipf_bounded(rng, 1.3, n, num_hosts)
    urls = [f"https://h{z}.example.org/p/{i:08d}" for i, z in enumerate(hosts)]
    ts = EPOCH_2026 + np.arange(n).astype("timedelta64[s]")
    widths = np.clip(rng.lognormal(5.0, 1.0, n), 10, 5000).astype(np.int64)

    htmls: list[bytes] = []
    for i in range(n):
        if i < len(_EDGE_BODIES):
            body = _EDGE_BODIES[i]
        else:
            tok_ids = _zipf_bounded(rng, 1.1, int(widths[i]), vocab)
            body = " ".join(f"tok{t:05d}" for t in tok_ids).encode()
        htmls.append(
            b"<html><head><title>T%d</title></head><body>%s</body></html>"
            % (i, body)
        )

    # ~1% exact duplicates of an earlier page's html under a distinct url
    if n > 10 and dup_rate > 0:
        n_dups = max(int(n * dup_rate), 1)
        dup_targets = rng.integers(len(_EDGE_BODIES), n, n_dups)
        dup_sources = rng.integers(len(_EDGE_BODIES), n, n_dups)
        for t, s in zip(dup_targets, dup_sources):
            if t != s:
                htmls[t] = htmls[s]

    texts = [extract_text(h) for h in htmls]
    # deterministic 90/5/5 language split by index (FIXTURES.md §1)
    langs = ["en" if i % 20 < 18 else ("de" if i % 20 == 18 else "fr") for i in range(n)]

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_documents_parquet(
    path: str, n: int, seed: int = 42, row_group_rows: int = 5000, **kw
) -> str:
    """Write with bounded row groups (~20 MB at default page sizes):
    Spark's scan-split parallelism is per row group, so a single giant
    row group serializes the whole build onto one task."""
    import pyarrow.parquet as pq

    pq.write_table(
        generate_documents(n, seed=seed, **kw), path, row_group_size=row_group_rows
    )
    return path


def warc_bytes(n: int, seed: int = 42, **kw) -> bytes:
    """Serialize the synthetic corpus as a WARC/1.0 archive (warcinfo
    record + one response record per page, HTTP payloads) — the
    container the north-star corpus actually ships in. Deterministic
    for a given (seed, n); record ids derive from the row index."""
    table = generate_documents(n, seed=seed, **kw)
    urls = table.column("url").to_pylist()
    tss = table.column("warc_ts").to_pylist()
    htmls = table.column("html").to_pylist()
    langs = table.column("lang").to_pylist()

    def record(warc_type: str, headers: list[tuple[str, str]], payload: bytes) -> bytes:
        head = [b"WARC/1.0", b"WARC-Type: " + warc_type.encode()]
        head += [f"{k}: {v}".encode() for k, v in headers]
        head += [b"Content-Length: %d" % len(payload)]
        return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"

    out = [
        record(
            "warcinfo",
            [("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000000>"),
             # WARC-Date is MANDATORY on every record (ISO 28500 §5.4);
             # strict parsers (warcio strict mode, CC tooling) reject
             # archives whose warcinfo omits it. Deterministic: the
             # first page's timestamp, not wall clock.
             ("WARC-Date", tss[0].strftime("%Y-%m-%dT%H:%M:%SZ") if tss
              else "2024-01-01T00:00:00Z"),
             ("Content-Type", "application/warc-fields")],
            b"software: sketchlib-datagen\r\n",
        )
    ]
    for i in range(len(urls)):
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"Content-Length: %d\r\n\r\n" % len(htmls[i])
        ) + htmls[i]
        iso = tss[i].strftime("%Y-%m-%dT%H:%M:%SZ")
        out.append(
            record(
                "response",
                [
                    # 0001 segment: never collides with the warcinfo
                    # record's all-zero uuid (ISO 28500 requires
                    # globally unique record ids)
                    ("WARC-Record-ID", f"<urn:uuid:00000000-0000-0000-0001-{i:012d}>"),
                    ("WARC-Target-URI", urls[i]),
                    ("WARC-Date", iso),
                    ("WARC-Identified-Content-Language", langs[i]),
                    ("Content-Type", "application/http;msgtype=response"),
                ],
                http,
            )
        )
    return b"".join(out)


def write_warc(path: str, n: int, seed: int = 42, gzip_compress: bool = False, **kw) -> str:
    """Write the synthetic corpus as a .warc (or whole-file .warc.gz)."""
    import gzip as _gzip

    blob = warc_bytes(n, seed=seed, **kw)
    data = _gzip.compress(blob, mtime=0) if gzip_compress else blob
    with open(path, "wb") as fh:
        fh.write(data)
    return path
