"""Shared test oracles for delta entries."""
import numpy as np

from paramugsy_tpu.formats.delta import DeltaEntry

_COMP = str.maketrans("ACGT", "TGCA")


def entry_gap_masks(de: DeltaEntry):
    L = de.alignment_length()
    rg = np.zeros(L, bool)
    for g in de.ref_gaps:
        rg[g.start - 1 : g.end] = True
    qg = np.zeros(L, bool)
    for g in de.query_gaps:
        qg[g.start - 1 : g.end] = True
    return rg, qg


def check_delta_valid(de: DeltaEntry):
    L = de.alignment_length()
    assert L == de.query_range.length + sum(g.length for g in de.query_gaps)
    rg, qg = entry_gap_masks(de)
    assert not (rg & qg).any()
    assert not rg[0] and not qg[0] and not rg[-1] and not qg[-1]
    for gaps in (de.ref_gaps, de.query_gaps):
        prev = 0
        for g in gaps:
            assert 1 <= g.start <= g.end <= L and g.start > prev
            prev = g.end


def entry_identity(de: DeltaEntry, ref: str, query: str) -> float:
    """Fraction of matched columns that agree, walking real sequences."""
    rg, qg = entry_gap_masks(de)
    assert de.ref_range.is_forward
    rseq = ref[de.ref_range.start - 1 : de.ref_range.end]
    if de.query_range.is_forward:
        qseq = query[de.query_range.start - 1 : de.query_range.end]
    else:
        qseq = query[de.query_range.end - 1 : de.query_range.start].translate(_COMP)[::-1]
    ri = qi = matches = cols = 0
    for c in range(de.alignment_length()):
        rc = None if rg[c] else rseq[ri]
        qc = None if qg[c] else qseq[qi]
        if rc is not None:
            ri += 1
        if qc is not None:
            qi += 1
        if rc is not None and qc is not None:
            cols += 1
            matches += rc == qc
    assert ri == len(rseq) and qi == len(qseq), "entry walks off its ranges"
    return matches / max(cols, 1)
