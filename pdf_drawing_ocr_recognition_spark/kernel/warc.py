"""WARC (Web ARChive, ISO 28500) record splitting — pure-Python kernel.

The crawl interchange format the pages table is materialized FROM in a real
pipeline (Common-Crawl-style ``.warc`` segment files).  This kernel is the
single source of truth for record semantics; the Spark layer
(``sources/warc.py``) only batches it over ``binaryFile`` splits, per the
repo's kernel/engine split.

Format essentials (public spec, ISO 28500 / IIPC warc-specifications):
* a record = ``WARC/1.0\\r\\n`` + header lines + ``\\r\\n`` + Content-Length
  bytes of block + ``\\r\\n\\r\\n`` trailer;
* ``WARC-Type: response`` records carry an HTTP response in the block —
  the payload (html) starts after the HTTP header section's ``\\r\\n\\r\\n``;
* request / metadata / warcinfo / resource records interleave with
  responses in the same file.

Reference analogue: none (the reference opens one local PDF,
``pdor/pdor_unit.py:97-109``); this is the north-rule crawl-source
generalization.
"""

from __future__ import annotations

_VERSIONS = (b"WARC/1.0", b"WARC/1.1")


def build_warc(records: list[dict]) -> bytes:
    """Serialize records (dicts with ``rec_type``, ``url``, ``date``,
    ``body`` bytes) into WARC/1.0 bytes — the deterministic test/fixture
    twin of :func:`split_warc_records`.  ``response`` bodies are wrapped in
    a minimal HTTP/1.1 200 header section, as in real crawl output."""
    out = bytearray()
    for r in records:
        body = r.get("body", b"")
        if r["rec_type"] == "response":
            block = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            )
        else:
            block = body
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + r["rec_type"].encode(),
            b"WARC-Date: " + r.get("date", "2024-01-01T00:00:00Z").encode(),
        ]
        if r.get("url"):
            headers.append(b"WARC-Target-URI: " + r["url"].encode())
        headers.append(b"Content-Length: " + str(len(block)).encode())
        out += b"\r\n".join(headers) + b"\r\n\r\n" + block + b"\r\n\r\n"
    return bytes(out)


def _parse_headers(raw: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in raw.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers


def split_warc_records(data: bytes) -> tuple[list[dict], dict]:
    """Split one WARC file's bytes into response rows.

    Returns ``(rows, stats)``: rows are dicts with ``url`` / ``date`` (the
    WARC-Date string) / ``html`` (payload bytes after the HTTP header
    section); stats counts records seen, responses kept, non-response
    records skipped, and a truncated/garbled tail (``n_bad``) — a clipped
    final record is dropped and counted, never half-parsed.
    """
    rows: list[dict] = []
    stats = {"n_records": 0, "n_responses": 0, "n_skipped": 0, "n_bad": 0}
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate extra separator noise between records
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data.startswith(_VERSIONS, pos):
            stats["n_bad"] += 1
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            stats["n_bad"] += 1
            break
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            stats["n_bad"] += 1
            break
        if length < 0:
            # a hostile negative length would move the cursor backward (or
            # hold it still — an infinite loop on a crafted record); treat
            # as garbled, like any other unparseable length
            stats["n_bad"] += 1
            break
        block_start = hdr_end + 4
        block_end = block_start + length
        if block_end > n:  # clipped final record
            stats["n_bad"] += 1
            break
        stats["n_records"] += 1
        if headers.get("warc-type") == "response":
            block = data[block_start:block_end]
            http_end = block.find(b"\r\n\r\n")
            payload = block[http_end + 4 :] if http_end >= 0 else block
            rows.append(
                {
                    "url": headers.get("warc-target-uri", ""),
                    "date": headers.get("warc-date", ""),
                    "html": payload,
                }
            )
            stats["n_responses"] += 1
        else:
            stats["n_skipped"] += 1
        pos = block_end
    return rows, stats
