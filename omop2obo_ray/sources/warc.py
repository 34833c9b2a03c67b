"""WARC (ISO 28500) sink and source — the container format
Common-Crawl ships pages in. The engine's input tables are
"Common-Crawl-style Parquet"; this module is the bridge from/to the
raw crawl artifact so a user can ingest real WARC segments or emit
them.

Scale shape:

- **Writer** (`write_warc`): each ``map_batches`` task frames its
  block's rows as `WARC/1.0` response records (headers +
  Content-Length-framed payload — binary-safe) and writes ONE
  ``part-*.warc`` file with an atomic rename; the driver sees only the
  per-task (path, rows) manifest. Partitioned output, resumable loads.
- **Reader** (`read_warc`): ``ray.data.read_binary_files`` makes the
  FILE the unit of parallelism (matching real CC segments, ~1 GB
  each); record parsing inside the task walks Content-Length offsets —
  never delimiter splits — so payloads containing ``\\r\\n\\r\\n`` or
  even full ``WARC/1.0`` banners round-trip byte-exact.

Subset honestly supported: uncompressed WARC, records carrying
``WARC-Target-URI`` / ``WARC-Date`` / ``Content-Length`` (the fields
CC response records always have). Gzip members and HTTP-header
stripping are out of scope here (payload is stored verbatim).
"""

from __future__ import annotations

import gzip
import os
import uuid

import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

_CRLF = b"\r\n"


def write_warc(pages: Dataset, out_dir: str, *,
               url_col: str = "url", ts_col: str = "warc_ts",
               payload_col: str = "payload",
               compression: str | None = None) -> pd.DataFrame:
    """Serialize (url, ts, binary payload) rows to partitioned
    ``part-*.warc`` files; returns the (path, rows) manifest frame.
    ``ts`` values are written verbatim into ``WARC-Date`` (pass ISO-8601
    strings); record ids are deterministic per (file-relative index).

    ``compression="gzip"`` writes ``part-*.warc.gz`` in the REAL
    Common-Crawl layout: one gzip MEMBER per record, concatenated —
    a range-read of a single member decompresses independently, which
    is how CC index lookups fetch one page out of a 1 GB segment."""
    if compression not in (None, "gzip"):
        raise ValueError(f"unsupported compression {compression!r}")
    os.makedirs(out_dir, exist_ok=True)

    def _write(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        urls = batch[url_col].to_pylist()
        tss = batch[ts_col].to_pylist()
        payloads = batch[payload_col].to_pylist()
        chunks = []
        for i, (u, t, p) in enumerate(zip(urls, tss, payloads)):
            if isinstance(p, str):
                p = p.encode("utf-8")
            hdr = (f"WARC/1.0\r\n"
                   f"WARC-Type: response\r\n"
                   f"WARC-Record-ID: <urn:rec:{i}>\r\n"
                   f"WARC-Date: {t}\r\n"
                   f"WARC-Target-URI: {u}\r\n"
                   f"Content-Length: {len(p)}\r\n"
                   f"\r\n").encode("utf-8")
            record = hdr + p + _CRLF + _CRLF
            if compression == "gzip":
                record = gzip.compress(record)
            chunks.append(record)
        ext = "warc.gz" if compression == "gzip" else "warc"
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(b"".join(chunks))
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([len(batch)], pa.int64())})

    return pages.map_batches(_write, batch_format="pyarrow",
                             batch_size=None).to_pandas()


def _parse_warc_bytes(data: bytes, origin: str):
    """Walk one WARC file's records by Content-Length offsets.
    Yields (url, ts, payload). Raises on malformed framing — silent
    drops would break round-trip identity."""
    pos, n = 0, len(data)
    while pos < n:
        # tolerate trailing blank lines between records
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError(f"{origin}: truncated WARC header at {pos}")
        header = data[pos:hdr_end].decode("utf-8")
        lines = header.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"{origin}: bad record banner {lines[0]!r}")
        fields = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except KeyError:
            raise ValueError(f"{origin}: record missing Content-Length")
        body_start = hdr_end + 4
        payload = data[body_start:body_start + length]
        if len(payload) != length:
            raise ValueError(f"{origin}: truncated payload at {body_start}")
        yield (fields.get("warc-target-uri", ""),
               fields.get("warc-date", ""), payload,
               fields.get("warc-type", ""))
        pos = body_start + length


def read_warc(path: str, *, responses_only: bool = False,
              http_strip: bool = False) -> Dataset:
    """Parse ``.warc`` files (a directory of parts or one file) back to
    (url, warc_ts, payload binary). One task per file — the CC-segment
    unit of parallelism.

    REAL-crawl flags (defaults keep the engine's own round-trip
    layout verbatim): ``responses_only=True`` drops non-``response``
    records (warcinfo/request/metadata — envelope noise for a KG
    pipeline; records without a WARC-Type, like this module's own
    pre-round-4 output, still pass); ``http_strip=True`` removes the
    wrapped HTTP status line + headers (CC response payloads are full
    HTTP messages) so the payload is the html body bytes — payloads
    that don't start with ``HTTP/`` pass through verbatim."""

    def _parse(batch: pa.Table) -> pa.Table:
        urls, tss, payloads = [], [], []
        paths = (batch["path"].to_pylist()
                 if "path" in batch.column_names else [""] * len(batch))
        for data, origin in zip(batch["bytes"].to_pylist(), paths):
            if data[:2] == b"\x1f\x8b":  # gzip magic: multi-member
                data = gzip.decompress(data)  # (handles concatenation)
            for u, t, p, wt in _parse_warc_bytes(
                    data, origin or "<warc>"):
                if responses_only and wt not in ("response", ""):
                    continue
                if http_strip and p[:5] == b"HTTP/":
                    # RFC headers end CRLFCRLF, but real crawl data
                    # includes servers emitting bare-LF terminators
                    # (ADVICE r4) — fall back so headers never leak
                    # into the body bytes.
                    he = p.find(_CRLF + _CRLF)
                    if he != -1:
                        p = p[he + 4:]
                    else:
                        he = p.find(b"\n\n")
                        if he != -1:
                            p = p[he + 2:]
                urls.append(u)
                tss.append(t)
                payloads.append(p)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "warc_ts": pa.array(tss, pa.string()),
                         "payload": pa.array(payloads, pa.binary())})

    return ray.data.read_binary_files(path, include_paths=True).map_batches(
        _parse, batch_format="pyarrow", batch_size=None)
