"""Reference extractor + deterministic datagen tests (SURVEY.md §7 step 1).

The north-rule per-row invariant is anchored here: `text` must equal
`extract_text(html)` byte-for-byte, and the generator must be fully
deterministic under (seed, n).
"""

from __future__ import annotations

from sketchlib.datagen import generate_documents
from sketchlib.textx import extract_text


def test_extract_basic():
    html = b"<html><head><title>Hi</title></head><body>hello <b>world</b></body></html>"
    assert extract_text(html) == "Hi\nhello world"


def test_extract_no_title():
    assert extract_text(b"<html><body>just body</body></html>") == "just body"


def test_extract_no_tags_at_all():
    assert extract_text(b"plain bytes") == "plain bytes"


def test_extract_empty_and_none():
    assert extract_text(b"") == ""
    assert extract_text(None) == ""


def test_extract_whitespace_collapsed():
    html = b"<html><body>a\n\n  b\t\tc</body></html>"
    assert extract_text(html) == "a b c"


def test_extract_non_ascii_nfc():
    html = "<html><body>héllo wörld</body></html>".encode()
    out = extract_text(html)
    assert out == "héllo wörld"
    # NFD input normalizes to NFC
    html_nfd = "<html><body>héllo</body></html>".encode()
    assert extract_text(html_nfd) == "héllo"


def test_extract_deterministic():
    html = b"<html><head><title>T</title></head><body>x y z</body></html>"
    assert extract_text(html) == extract_text(html)


def test_datagen_schema_and_invariant():
    t = generate_documents(200, seed=42)
    assert t.column_names == ["url", "warc_ts", "html", "text", "lang"]
    assert t.num_rows == 200
    htmls = t.column("html").to_pylist()
    texts = t.column("text").to_pylist()
    # the per-row invariant, byte for byte
    for h, x in zip(htmls, texts):
        assert extract_text(h) == x


def test_datagen_deterministic():
    a = generate_documents(300, seed=42)
    b = generate_documents(300, seed=42)
    assert a.equals(b)
    c = generate_documents(300, seed=43)
    assert not a.equals(c)


def test_datagen_urls_unique_and_hosts_skewed():
    t = generate_documents(2000, seed=42)
    urls = t.column("url").to_pylist()
    assert len(set(urls)) == len(urls)
    hosts = [u.split("/")[2] for u in urls]
    top = max(hosts.count(h) for h in set(hosts))
    assert top / len(hosts) > 0.15  # Zipf(1.3) skew is material


def test_datagen_has_exact_duplicate_texts():
    t = generate_documents(2000, seed=42, dup_rate=0.01)
    texts = t.column("text").to_pylist()
    assert len(set(texts)) < len(texts)
