"""WARC (Web ARChive, ISO 28500) reader/writer — pure stdlib.

WARC is the container web crawls ship in (Common Crawl's corpus is
WARC), which makes it the canonical ingestion format for an LLM
training-data pipeline: a crawl dump lands as binary payload columns,
and this module turns them into a records DataFrame the cleaning /
dedup / quality lanes consume.

Two physical layouts are handled transparently:

- plain concatenated ``WARC/1.x`` records;
- gzip **member-per-record** streams (the Common Crawl convention:
  each record is its own gzip member, so readers can split on member
  boundaries) — any multistream gzip concatenation inflates correctly
  via the ``decompressobj.unused_data`` loop.

Spark posture mirrors the media codecs (operators/multimodal.py):
payload bytes flow through an Arrow-batched ``mapInPandas``, records
come out as typed columns, and the raw payload is projected away
before any shuffle. Malformed containers raise ``ValueError`` —
quarantine, never half-parsed garbage.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_CRLF = b"\r\n"


def _inflate_members(payload: bytes) -> bytes:
    """Concatenated-gzip-member inflate (multistream): loop a fresh
    decompressobj over each member's unused tail."""
    import zlib

    out = bytearray()
    rest = payload
    while rest:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)  # gzip wrapper
        try:
            out += d.decompress(rest)
        except zlib.error as exc:
            raise ValueError(f"bad gzip member in WARC stream: {exc}") from exc
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        rest = d.unused_data
    return bytes(out)


def parse_warc_records(payload: bytes) -> list[dict]:
    """Parse a WARC byte stream into a list of records, each a dict
    with ``headers`` (name -> value, names lower-cased) and
    ``content`` (the raw payload bytes). Gzip streams are inflated
    first (member-per-record or any multistream concatenation).
    Raises ValueError on malformed input: bad version line, missing
    or non-numeric Content-Length, truncated content, bad record
    separator."""
    if payload is None or len(payload) == 0:
        raise ValueError("empty WARC payload")
    data = bytes(payload)
    if data[:2] == b"\x1f\x8b":
        data = _inflate_members(data)
    records = []
    pos = 0
    while pos < len(data):
        # tolerate trailing CRLFs between records
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= len(data):
            break
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("unterminated WARC version line")
        version = data[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line {version[:20]!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise ValueError("unterminated WARC header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break  # empty line: content follows
            name, sep, value = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header {line[:40]!r}")
            headers[name.strip().decode("ascii", "replace").lower()] = (
                value.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise ValueError("WARC record missing Content-Length") from None
        except ValueError:
            raise ValueError(
                f"non-numeric Content-Length {headers['content-length']!r}"
            ) from None
        if length < 0 or pos + length > len(data):
            raise ValueError("WARC content extends past the stream")
        content = data[pos : pos + length]
        pos += length
        if data[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError("missing WARC record separator")
        pos += 4
        records.append(
            {"version": version.decode("ascii"), "headers": headers,
             "content": content}
        )
    if not records:
        raise ValueError("no WARC records")
    return records


def write_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Inverse of :func:`parse_warc_records`: each record needs
    ``headers`` (dict; Content-Length is (re)computed) and ``content``
    (bytes). ``gzip_members=True`` writes the Common Crawl layout —
    one gzip member per record."""
    import gzip

    out = bytearray()
    for rec in records:
        body = bytearray(b"WARC/1.0\r\n")
        headers = {k: v for k, v in rec.get("headers", {}).items()
                   if k.lower() != "content-length"}
        content = bytes(rec["content"])
        for name, value in headers.items():
            body += f"{name}: {value}\r\n".encode()
        body += f"Content-Length: {len(content)}\r\n\r\n".encode()
        body += content + _CRLF + _CRLF
        if gzip_members:
            out += gzip.compress(bytes(body), 6)
        else:
            out += body
    return bytes(out)


def split_http_response(content: bytes):
    """Split the HTTP envelope a Common Crawl ``response`` record
    carries: returns (status_code, headers dict lower-cased, body
    bytes). Returns (None, {}, content) when the content is not an
    HTTP response — WARC metadata/request records flow through
    unsplit rather than erroring."""
    if not content.startswith(b"HTTP/"):
        return None, {}, content
    head, sep, body = content.partition(b"\r\n\r\n")
    if not sep:
        return None, {}, content
    lines = head.split(b"\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[1].isdigit():
        return None, {}, content
    headers: dict[str, str] = {}
    for line in lines[1:]:
        name, hsep, value = line.partition(b":")
        if hsep:
            headers[name.strip().decode("ascii", "replace").lower()] = (
                value.strip().decode("utf-8", "replace")
            )
    return int(parts[1]), headers, body


WARC_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("rec_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("content_text", T.StringType()),
    ]
)

WARC_HTTP_SCHEMA = T.StructType(
    list(WARC_RECORDS_SCHEMA)
    + [
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("body_text", T.StringType()),
    ]
)


def read_warc_records(
    df: DataFrame, id_col: str, payload_col: str, parse_http: bool = False
) -> DataFrame:
    """1->N record expansion over WARC payload columns: each input row
    becomes one output row per WARC record (type, target URI, length,
    UTF-8-decoded content). With ``parse_http=True`` the HTTP envelope
    inside ``response`` records is split too (status, Content-Type,
    body) — the form the HTML-strip / quality lanes consume; non-HTTP
    records carry a null status and their content as the body.
    Arrow-batched mapInPandas; payload bytes are projected away before
    any shuffle; rows whose payload fails to parse are dropped
    (corrupt-crawl posture: quarantine the document, keep the batch)."""
    schema = WARC_HTTP_SCHEMA if parse_http else WARC_RECORDS_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in schema}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    records = parse_warc_records(
                        bytes(payload) if payload is not None else None
                    )
                except ValueError:
                    continue
                for j, rec in enumerate(records):
                    rows["doc_id"].append(int(doc_id))
                    rows["rec_idx"].append(j)
                    rows["warc_type"].append(rec["headers"].get("warc-type", ""))
                    rows["target_uri"].append(
                        rec["headers"].get("warc-target-uri", "")
                    )
                    rows["content_length"].append(len(rec["content"]))
                    rows["content_text"].append(
                        rec["content"].decode("utf-8", "replace")
                    )
                    if parse_http:
                        status, hdrs, body = split_http_response(rec["content"])
                        rows["http_status"].append(status)
                        rows["http_content_type"].append(
                            hdrs.get("content-type")
                        )
                        rows["body_text"].append(body.decode("utf-8", "replace"))
            pdf_out = pd.DataFrame(rows)
            if parse_http and len(pdf_out):
                pdf_out["http_status"] = pdf_out["http_status"].astype("Int32")
            yield pdf_out

    return df.select(id_col, payload_col).mapInPandas(run, schema)
