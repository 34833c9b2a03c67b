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


def _parse_warc_bytes(data: bytes, origin: str,
                      on_error: str = "raise"):
    """Walk one WARC file's records by Content-Length offsets.
    Yields (url, ts, payload). ``on_error='raise'`` (default) raises
    on malformed framing — silent drops would break round-trip
    identity. ``on_error='skip'`` is the 100-TB crawl posture: a
    corrupt record RESYNCS to the next ``WARC/`` banner and keeps
    going, so one damaged segment region never kills the map task
    or discards the rest of the file."""

    def _fail(msg):
        if on_error == "raise":
            raise ValueError(msg)
        return data.find(b"WARC/1.", pos + 1)  # resync or -1

    pos, n = 0, len(data)
    while pos < n:
        # tolerate trailing blank lines between records
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            nxt = _fail(f"{origin}: truncated WARC header at {pos}")
            if nxt is None or nxt < 0:
                break
            pos = nxt
            continue
        try:
            header = data[pos:hdr_end].decode("utf-8")
        except UnicodeDecodeError:
            nxt = _fail(f"{origin}: undecodable header at {pos}")
            if nxt is None or nxt < 0:
                break
            pos = nxt
            continue
        lines = header.split("\r\n")
        if not lines[0].startswith("WARC/"):
            nxt = _fail(f"{origin}: bad record banner {lines[0]!r}")
            if nxt is None or nxt < 0:
                break
            pos = nxt
            continue
        fields = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError):
            nxt = _fail(f"{origin}: record missing Content-Length")
            if nxt is None or nxt < 0:
                break
            pos = nxt
            continue
        body_start = hdr_end + 4
        payload = data[body_start:body_start + length]
        if len(payload) != length:
            nxt = _fail(f"{origin}: truncated payload at {body_start}")
            if nxt is None or nxt < 0:
                break
            pos = nxt
            continue
        yield (fields.get("warc-target-uri", ""),
               fields.get("warc-date", ""), payload,
               fields.get("warc-type", ""))
        pos = body_start + length


def read_warc(path: str, *, responses_only: bool = False,
              http_strip: bool = False,
              on_error: str = "raise") -> Dataset:
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
    that don't start with ``HTTP/`` pass through verbatim.
    ``on_error='skip'`` (crawl posture) resyncs past corrupt records
    and drops undecompressable gzip files instead of failing the map
    task; the default ``'raise'`` keeps round-trip identity exact."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be raise|skip, got {on_error!r}")

    def _parse(batch: pa.Table) -> pa.Table:
        urls, tss, payloads = [], [], []
        paths = (batch["path"].to_pylist()
                 if "path" in batch.column_names else [""] * len(batch))
        for data, origin in zip(batch["bytes"].to_pylist(), paths):
            if data[:2] == b"\x1f\x8b":  # gzip magic: multi-member
                try:
                    data = gzip.decompress(data)  # handles concatenation
                except (OSError, EOFError):
                    if on_error == "raise":
                        raise
                    continue  # skip the undecompressable file
            for u, t, p, wt in _parse_warc_bytes(
                    data, origin or "<warc>", on_error=on_error):
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

    if on_error == "skip":
        # skip mode must see RAW bytes: Ray's read_binary_files lets
        # Arrow auto-decompress *.gz inside the READ task (suffix
        # inference, file_based_datasource.py:338-365), where a
        # truncated stream raises before any guard can run. Read
        # through pyarrow.fs directly (no compression inference);
        # gunzip happens in _parse under the per-file guard. The
        # driver holds only the path list (segment count, bounded).
        from pyarrow import fs as pafs

        if "://" in path:
            fs_, root = pafs.FileSystem.from_uri(path)
        else:
            fs_, root = pafs.LocalFileSystem(), path
        info = fs_.get_file_info(root)
        if info.type == pafs.FileType.Directory:
            paths = sorted(
                f.path for f in fs_.get_file_info(
                    pafs.FileSelector(root))
                if f.type == pafs.FileType.File)
        else:
            paths = [root]

        def _read_raw(batch: pa.Table) -> pa.Table:
            datas, ps = [], []
            for pth in batch["path"].to_pylist():
                try:
                    with fs_.open_input_stream(pth) as f:
                        datas.append(f.read())
                    ps.append(pth)
                except OSError:
                    continue  # unreadable file: skip whole
            return pa.table({
                "bytes": pa.array(datas, pa.large_binary()),
                "path": pa.array(ps, pa.string())})

        src = ray.data.from_items(
            [{"path": p} for p in paths]).map_batches(
            _read_raw, batch_format="pyarrow", batch_size=1)
        return src.map_batches(_parse, batch_format="pyarrow",
                               batch_size=None)
    return ray.data.read_binary_files(path, include_paths=True).map_batches(
        _parse, batch_format="pyarrow", batch_size=None)
