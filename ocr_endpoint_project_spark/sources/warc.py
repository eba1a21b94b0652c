"""WARC/1.0 source connector — the container Common Crawl actually ships.

The engine's input contract is the ``pages`` table (BASELINE.json
input_hint), but real crawl data arrives as ``.warc.gz`` files: per-record
gzip members, each a WARC response record framed by CRLF headers and an
exact ``Content-Length``, wrapping an HTTP response whose body is the
page payload. This module implements both directions from the public
spec (ISO 28500) in stdlib:

* :func:`write_warc` — response records with correct framing (and
  optional per-record gzip members, the Common-Crawl layout);
* :func:`parse_warc` — a real record walk: header block split on the
  first blank line, body sliced by ``Content-Length``, record separator
  consumed, multi-member gzip handled via ``zlib`` ``unused_data``
  (NOT ``gzip.decompress``, which concatenates members and loses
  record boundaries on malformed tails);
* :func:`pages_rows_from_warc` — WARC bytes -> rows of the ``pages``
  schema (url, warc_ts, html, lang) ready for the extraction pipeline.

Reference scope note: the reference ingests uploads one file at a time
(cv_api/main.py:322-348); at 10^12-document scale the same role is
played by WARC segment blobs fanned out across executors — each blob
parses independently, so the source is embarrassingly parallel.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

_CRLF = b"\r\n"


def _http_response(body: bytes, content_type: str, status: int = 200) -> bytes:
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(status, "Status")
    return (
        f"HTTP/1.1 {status} {reason}".encode() + _CRLF
        + f"Content-Type: {content_type}".encode() + _CRLF
        + f"Content-Length: {len(body)}".encode() + _CRLF
        + _CRLF
        + body
    )


def write_warc(
    records: list[tuple], gzip_members: bool = False
) -> bytes:
    """(url, date, body, content_type[, http_status]) records ->
    WARC/1.0 bytes.

    ``gzip_members=True`` wraps each record in its own gzip member —
    the Common-Crawl ``.warc.gz`` layout enabling per-record seeks."""
    out = bytearray()
    for i, rec_tuple in enumerate(records):
        url, date, body, ctype = rec_tuple[:4]
        status = rec_tuple[4] if len(rec_tuple) > 4 else 200
        http = _http_response(body, ctype, status)
        head = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: response" + _CRLF
            + f"WARC-Record-ID: <urn:uuid:{i:032x}>".encode() + _CRLF
            + f"WARC-Target-URI: {url}".encode() + _CRLF
            + f"WARC-Date: {date.strftime('%Y-%m-%dT%H:%M:%SZ')}".encode() + _CRLF
            + b"Content-Type: application/http; msgtype=response" + _CRLF
            + f"Content-Length: {len(http)}".encode() + _CRLF
            + _CRLF
        )
        rec = head + http + _CRLF + _CRLF
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)  # gzip wrapper
            rec = co.compress(rec) + co.flush()
        out += rec
    return bytes(out)


def _gunzip_members(data: bytes, tolerant: bool = False) -> bytes:
    """Concatenated gzip members -> concatenated plain bytes.

    ``tolerant=True`` keeps the complete members before a truncated or
    corrupt one instead of raising — partial output from the broken
    member is DISCARDED (it would be a half record; the record walk has
    no way to resynchronize inside a cut deflate stream)."""
    out = bytearray()
    rest = data
    while rest:
        d = zlib.decompressobj(31)
        try:
            member = d.decompress(rest) + d.flush()
        except zlib.error:
            if tolerant:
                return bytes(out)
            raise ValueError("corrupt gzip member in WARC") from None
        if not d.eof:
            if tolerant:
                return bytes(out)
            raise ValueError("truncated gzip member in WARC")
        out += member
        rest = d.unused_data
    return bytes(out)


def parse_warc(data: bytes, tolerant: bool = False) -> list[dict]:
    """WARC bytes (plain or per-record gzip) -> list of record dicts
    with keys url, date, warc_type, http_status, content_type, body.

    ``tolerant=True`` is the multi-segment crawl-read mode: a framing
    error (bad magic, cut header, short body) ends the walk and returns
    the records parsed so far — one damaged segment degrades to its
    intact prefix instead of failing the whole job."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data, tolerant=tolerant)
    records: list[dict] = []
    pos, n = 0, len(data)
    while pos < n:
        try:
            if data[pos : pos + 5] != b"WARC/":
                raise ValueError(f"bad WARC record header at offset {pos}")
            hdr_end = data.find(_CRLF + _CRLF, pos)
            if hdr_end == -1:
                raise ValueError("unterminated WARC header block")
            headers: dict[str, str] = {}
            for line in data[pos:hdr_end].split(_CRLF)[1:]:
                k, _, v = line.decode("utf-8", "replace").partition(":")
                headers[k.strip().lower()] = v.strip()
            length_hdr = headers.get("content-length")
            if length_hdr is None:
                raise ValueError(f"WARC record at offset {pos} missing Content-Length")
            length = int(length_hdr)
            block = data[hdr_end + 4 : hdr_end + 4 + length]
            if len(block) < length:
                raise ValueError("truncated WARC record body")
        except ValueError:
            if tolerant:
                break
            raise
        pos = hdr_end + 4 + length
        if data[pos : pos + 4] == _CRLF + _CRLF:
            pos += 4
        status, ctype, body = None, None, block
        if headers.get("content-type", "").startswith("application/http"):
            he = block.find(_CRLF + _CRLF)
            if he != -1:
                http_lines = block[:he].split(_CRLF)
                parts = http_lines[0].split(b" ", 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for line in http_lines[1:]:
                    k, _, v = line.decode("utf-8", "replace").partition(":")
                    if k.strip().lower() == "content-type":
                        ctype = v.strip()
                body = block[he + 4 :]
        records.append(
            {
                "url": headers.get("warc-target-uri"),
                "date": headers.get("warc-date"),
                "warc_type": headers.get("warc-type"),
                "http_status": status,
                "content_type": ctype,
                "body": body,
            }
        )
    return records


def pages_rows_from_warc(data: bytes, tolerant: bool = False) -> list[tuple]:
    """WARC bytes -> (url, warc_ts, html, lang) rows of the pages schema.
    Non-response records and non-200 responses are skipped (the crawl
    hygiene rule); lang is left None for the language-ID operator."""
    rows = []
    for rec in parse_warc(data, tolerant=tolerant):
        if rec["warc_type"] != "response" or rec["http_status"] != 200:
            continue
        ts = None
        if rec["date"]:
            ts = datetime.strptime(rec["date"], "%Y-%m-%dT%H:%M:%SZ").replace(
                tzinfo=timezone.utc
            )
        rows.append((rec["url"], ts, rec["body"], None))
    return rows
