"""Profile merge of two alignment levels (the mugsyWGA-on-profiles role).

One ``merge_blocks`` call is the reference's whole 7-command profile-merge
pipeline (lib/base/mugsy_profiles_task.ml:40-87) in memory:

    make(left) + make(right)            -> profile sets + consensus pseudo-seqs
    m_translate                         -> genome deltas in profile coords
    LCB selection (delta-filter/mugsyWGA chaining role)
    delta2maf + mugsyWGA                -> blocks over pseudo-sequences
    untranslate                         -> blocks in genome coordinates

plus *unique-region emission*: pseudo-sequence intervals not covered by any
selected alignment are passed through as blocks so deeper-level alignments
are preserved (mugsyWGA's --unique true behaviour, cf.
lib/mugsy/mugsy_mugsy.ml:125-144).
"""
from __future__ import annotations

from bisect import bisect_left, insort
from typing import Iterable, Sequence

from paramugsy_tpu.coords.profile import Profile
from paramugsy_tpu.coords.range import FORWARD, Range
from paramugsy_tpu.formats.delta import DeltaEntry
from paramugsy_tpu.formats.delta_maf import delta_to_maf_blocks
from paramugsy_tpu.formats.maf import MafBlock, MafSequence
from paramugsy_tpu.profiles.make import consensus_text, profiles_of_block
from paramugsy_tpu.profiles.native_translate import translate_deltas_fast as translate_deltas
from paramugsy_tpu.profiles.untranslate import untranslate_blocks


def make_profiles_mem(
    blocks: Sequence[MafBlock], basename: str
) -> tuple[list[Profile], dict[str, str]]:
    """In-memory ``mugsy_profiles make``: profiles + consensus pseudo-seqs."""
    profiles: list[Profile] = []
    consensus: dict[str, str] = {}
    for i, b in enumerate(blocks):
        major = f"{basename}.{basename}_{i:04d}"
        rows = profiles_of_block(b, major)
        profiles.extend(rows)
        consensus[major] = consensus_text([p.text for p in rows])
    return profiles, consensus


class _Occupancy:
    """Per-sequence disjoint-interval bookkeeping for LCB selection."""

    def __init__(self):
        self._by_seq: dict[str, list[tuple[int, int]]] = {}

    def free(self, seq: str, r: Range) -> bool:
        ivs = self._by_seq.get(seq)
        if not ivs:
            return True
        ra = r.abs()
        i = bisect_left(ivs, (ra.start, ra.start))
        if i < len(ivs) and ivs[i][0] <= ra.end:
            return False
        if i > 0 and ivs[i - 1][1] >= ra.start:
            return False
        return True

    def claim(self, seq: str, r: Range) -> None:
        ra = r.abs()
        insort(self._by_seq.setdefault(seq, []), (ra.start, ra.end))

    def uncovered(self, seq: str, length: int) -> list[tuple[int, int]]:
        """1-indexed inclusive complement intervals."""
        out = []
        pos = 1
        for s, e in self._by_seq.get(seq, []):
            if s > pos:
                out.append((pos, s - 1))
            pos = max(pos, e + 1)
        if pos <= length:
            out.append((pos, length))
        return out


def select_consistent(
    entries: Iterable[DeltaEntry], min_length: int = 30
) -> tuple[list[DeltaEntry], _Occupancy]:
    """Greedy heaviest-first tiling: each sequence region appears in at most
    one selected alignment (the LCB/delta-filter -1 role)."""
    occ = _Occupancy()
    kept: list[DeltaEntry] = []
    ranked = sorted(entries, key=lambda e: -e.alignment_length())
    for e in ranked:
        if e.ref_range.length < min_length or e.query_range.length < min_length:
            continue
        if occ.free(e.ref_name, e.ref_range) and occ.free(e.query_name, e.query_range):
            occ.claim(e.ref_name, e.ref_range)
            occ.claim(e.query_name, e.query_range)
            kept.append(e)
    kept.sort(key=lambda e: (e.ref_name, e.ref_range.abs().start))
    return kept, occ


def merge_blocks(
    left_blocks: Sequence[MafBlock],
    right_blocks: Sequence[MafBlock],
    genome_deltas: Iterable[DeltaEntry],
    *,
    basename_left: str = "l",
    basename_right: str = "r",
    min_length: int = 30,
    emit_unique: bool = True,
    refine: bool = False,
    refine_max_cols: int = 50_000,
) -> list[MafBlock]:
    """Merge two alignment levels through genome-space pairwise deltas."""
    lps, lcons = make_profiles_mem(left_blocks, basename_left)
    rps, rcons = make_profiles_mem(right_blocks, basename_right)

    translated = translate_deltas(lps, rps, genome_deltas)
    kept, occ = select_consistent(translated, min_length=min_length)

    out = list(delta_to_maf_blocks(kept, lcons, rcons))

    if emit_unique:
        for cons in (lcons, rcons):
            for major, text in cons.items():
                for s, e in occ.uncovered(major, len(text)):
                    out.append(
                        MafBlock(
                            seqs=[
                                MafSequence(
                                    name=major,
                                    start=s - 1,
                                    size=e - s + 1,
                                    strand=FORWARD,
                                    src_size=len(text),
                                    text=text[s - 1 : e],
                                )
                            ],
                            score=0,
                            attrs={"label": "1", "mult": "1"},
                        )
                    )

    merged = list(untranslate_blocks(lps + rps, out))
    if refine:
        from paramugsy_tpu.lcb.refine import refine_blocks

        refine_blocks(merged, max_cols=refine_max_cols)
    for b in merged:
        b.attrs["mult"] = str(len(b.seqs))
        b.score = max(len(s.text) for s in b.seqs) if b.seqs else 0
    return merged
