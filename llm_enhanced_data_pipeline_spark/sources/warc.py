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


#: ISO 28500 §5 mandatory named fields (besides Content-Length, which
#: is always recomputed) and the deterministic fill used when a caller
#: omits one. WARC-Record-ID is derived per record below (uuid5 of the
#: content + index, so re-writing the same records is reproducible);
#: WARC-Date uses the epoch placeholder — an honest "unknown capture
#: time" marker, never a fabricated crawl timestamp.
_MANDATORY_FILLS = {
    "warc-type": "resource",
    "warc-date": "1970-01-01T00:00:00Z",
}


def write_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Inverse of :func:`parse_warc_records`: each record needs
    ``headers`` (dict; Content-Length is (re)computed) and ``content``
    (bytes). ``gzip_members=True`` writes the Common Crawl layout —
    one gzip member per record.

    Header hygiene (ISO 28500): names/values containing CR or LF are
    REJECTED with ValueError — a CRLF smuggled in an untrusted crawl
    header would silently corrupt record framing — as are empty names
    and names containing ``:``. The mandatory named fields WARC-Type,
    WARC-Date and WARC-Record-ID are auto-filled deterministically
    when absent (type ``resource``, the epoch-placeholder date, and a
    uuid5 of the record content + index), so every stream this writer
    emits is schema-complete per the spec."""
    import gzip
    import hashlib
    import uuid

    out = bytearray()
    for i, rec in enumerate(records):
        body = bytearray(b"WARC/1.0\r\n")
        headers = {k: v for k, v in rec.get("headers", {}).items()
                   if k.lower() != "content-length"}
        content = bytes(rec["content"])
        present = {k.lower() for k in headers}
        for lower, fill in _MANDATORY_FILLS.items():
            if lower not in present:
                headers["-".join(p.upper() if p == "warc" else p.capitalize()
                                 for p in lower.split("-"))] = fill
        if "warc-record-id" not in present:
            # uuid5 over the FULL content digest (O(n) next to the
            # write anyway), not a 64-byte prefix: prefix-based IDs
            # collide across merged archives whenever records share
            # position and a prefix, while ISO 28500 wants global
            # uniqueness. Still position-salted so identical content
            # at different offsets in ONE stream gets distinct IDs.
            digest = hashlib.sha256(content).hexdigest()
            rid = uuid.uuid5(uuid.NAMESPACE_URL,
                             f"warc-record/{i}/{len(content)}/{digest}")
            headers["WARC-Record-ID"] = f"<urn:uuid:{rid}>"
        for name, value in headers.items():
            name, value = str(name), str(value)
            if not name or ":" in name or any(c in "\r\n" for c in name):
                raise ValueError(f"bad WARC header name {name!r}")
            if any(c in "\r\n" for c in value):
                raise ValueError(
                    f"CR/LF in WARC header value for {name!r}"
                )
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
    unsplit rather than erroring.

    Both CRLF-CRLF and bare-LF-LF head/body separators are accepted
    (real crawls carry servers that terminate headers with ``\\n\\n``;
    treating those as "not HTTP" leaked raw header text into the
    document-body lanes), and header lines split on ``\\r?\\n``."""
    if not content.startswith(b"HTTP/"):
        return None, {}, content
    i_crlf = content.find(b"\r\n\r\n")
    i_lf = content.find(b"\n\n")
    if i_crlf < 0 and i_lf < 0:
        return None, {}, content
    if i_crlf >= 0 and (i_lf < 0 or i_crlf <= i_lf):
        head, body = content[:i_crlf], content[i_crlf + 4:]
    else:
        head, body = content[:i_lf], content[i_lf + 2:]
    lines = [ln[:-1] if ln.endswith(b"\r") else ln
             for ln in head.split(b"\n")]
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
