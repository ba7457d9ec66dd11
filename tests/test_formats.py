"""Tests for FASTA/MAF/delta format IO."""
import io
import os

import pytest

from paramugsy_tpu.coords.range import FORWARD, REVERSE, Range
from paramugsy_tpu.formats.fasta import (
    normalize_header,
    read_fasta,
    rewrite_fasta,
    species_of_path,
    write_fasta,
)
from paramugsy_tpu.formats.maf import (
    MafBlock,
    MafSequence,
    fasta_to_maf,
    maf_to_xmfa,
    read_maf,
    write_maf,
)
from paramugsy_tpu.formats.delta import (
    DeltaEntry,
    DeltaWriter,
    gaps_of_offsets,
    offsets_of_gaps,
    read_delta,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


class TestFasta:
    def test_round_trip(self, tmp_path):
        p = tmp_path / "x.fasta"
        with open(p, "w") as f:
            write_fasta(f, [("a", "ACGT" * 30), ("b", "TTTT")], width=50)
        recs = list(read_fasta(str(p)))
        assert recs == [("a", "ACGT" * 30), ("b", "TTTT")]

    def test_species_of_path(self):
        assert species_of_path("/x/y/e-coli.k12.fasta") == "e_coli"
        assert species_of_path("strep") == "strep"

    def test_normalize_ncbi(self):
        assert normalize_header("gi|123|ref|NC_000913.3|", "ecoli") == "ecoli.NC_000913"

    def test_normalize_species_colon(self):
        assert normalize_header("strep:chr1", "ignored") == "strep.chr1"

    def test_normalize_plain(self):
        assert normalize_header("contig 1.5-x", "sp") == "sp.contig_1_5_x"

    def test_rewrite_fasta(self, tmp_path):
        src = tmp_path / "mygenome.fa"
        src.write_text(">gi|1|ref|ACC.2|\nACGT\n>plain one\nGGGG\n")
        out = tmp_path / "out.fa"
        names = rewrite_fasta(str(src), str(out))
        assert names == ["mygenome.ACC", "mygenome.plain_one"]
        assert list(read_fasta(str(out))) == [
            ("mygenome.ACC", "ACGT"),
            ("mygenome.plain_one", "GGGG"),
        ]


class TestMaf:
    def test_read_fixture(self):
        blocks = list(read_maf(os.path.join(DATA, "highly_stitchable.maf")))
        assert len(blocks) == 8
        b0 = blocks[0]
        assert b0.score == 99999
        assert b0.attrs == {"label": "1", "mult": "4"}
        assert [s.name for s in b0.seqs] == ["A", "B", "C", "D"]
        assert b0.seqs[0].start == 0 and b0.seqs[0].size == 20
        # block 6 has the reverse-strand B row
        b6 = blocks[6]
        brow = [s for s in b6.seqs if s.name == "B"][0]
        assert brow.strand == REVERSE
        assert brow.range() == Range(80, 61)
        assert brow.forward_interval() == (60, 79)

    def test_round_trip(self, tmp_path):
        src = os.path.join(DATA, "highly_stitchable.maf")
        blocks = list(read_maf(src))
        out = tmp_path / "rt.maf"
        write_maf(str(out), blocks)
        blocks2 = list(read_maf(str(out)))
        assert blocks == blocks2
        # Byte-identity with the fixture (modulo trailing whitespace).
        orig = [l.rstrip() for l in open(src) if l.strip()]
        ours = [l.rstrip() for l in open(out) if l.strip()]
        assert orig == ours

    def test_maf_to_xmfa(self, tmp_path):
        buf = io.StringIO()
        maf_to_xmfa(os.path.join(DATA, "highly_stitchable.maf"), buf)
        lines = buf.getvalue().splitlines()
        assert lines[0] == ">A 0 20 + 100"
        assert lines[1] == "N" * 20
        assert lines.count("=") == 8

    def test_fasta_to_maf(self, tmp_path):
        fa = tmp_path / "g.fa"
        fa.write_text(">g.c1\nACGTACGT\n")
        buf = io.StringIO()
        fasta_to_maf(str(fa), buf)
        blocks = list(read_maf(io.StringIO(buf.getvalue())))
        assert len(blocks) == 1
        s = blocks[0].seqs[0]
        assert (s.name, s.start, s.size, s.src_size, s.text) == ("g.c1", 0, 8, 8, "ACGTACGT")


class TestDelta:
    def test_gaps_of_offsets(self):
        # Example: ref gap at gapped pos 3, then query gaps at 7,8.
        # offsets: -3 (pos 3, ref), 4 (pos 7, query), 1 (pos 8, query), 0
        ref_gaps, query_gaps = gaps_of_offsets([-3, 4, 1])
        assert ref_gaps == [Range(3, 3)]
        assert query_gaps == [Range(7, 8)]

    def test_offsets_round_trip(self):
        cases = [
            [-3, 4, 1],
            [5, 1, 1, -10, -1],
            [],
            [-1, -1, -1],
            [2, -3, 2, -3],
        ]
        for offs in cases:
            rg, qg = gaps_of_offsets(offs)
            assert offsets_of_gaps(rg, qg) == offs + [0]

    def mk_entry(self):
        return DeltaEntry(
            ref_name="r", query_name="q", ref_len=1000, query_len=900,
            ref_range=Range(11, 20), query_range=Range(101, 112),
            ref_gaps=[Range(3, 4)], query_gaps=[],
        )

    def test_alignment_length(self):
        de = self.mk_entry()
        assert de.alignment_length() == 12
        assert de.query_profile().length == 12

    def test_reverse_involution(self):
        de = self.mk_entry()
        rev = de.reverse()
        assert rev.ref_range == Range(20, 11)
        assert rev.query_range == Range(112, 101)
        # gap (3,4) in length-12 alignment mirrors to (9, 10)
        assert rev.ref_gaps == [Range(9, 10)]
        back = rev.reverse()
        assert back.ref_range == de.ref_range
        assert back.ref_gaps == de.ref_gaps
        assert back.query_gaps == de.query_gaps

    def test_file_round_trip(self, tmp_path):
        de1 = self.mk_entry()
        de2 = DeltaEntry(
            ref_name="r", query_name="q2", ref_len=1000, query_len=500,
            ref_range=Range(50, 40), query_range=Range(1, 11),
            ref_gaps=[], query_gaps=[Range(5, 5)], errors=(7, 8, 9),
        )
        path = tmp_path / "t.delta"
        with open(path, "w") as f:
            w = DeltaWriter(f, "ref.fa", "q.fa")
            w.write(de1)
            w.write(de2)
        entries = list(read_delta(str(path)))
        assert len(entries) == 2
        assert entries[0].ref_range == de1.ref_range
        assert entries[0].ref_gaps == de1.ref_gaps
        assert entries[0].query_gaps == de1.query_gaps
        assert entries[1].query_name == "q2"
        assert entries[1].query_gaps == [Range(5, 5)]
        assert entries[1].errors == (7, 8, 9)

    def test_header_dedup(self, tmp_path):
        de = self.mk_entry()
        buf = io.StringIO()
        w = DeltaWriter(buf, "a", "b")
        w.write(de)
        w.write(de)
        assert buf.getvalue().count(">r q") == 1


class TestXmfaReader:
    def test_round_trip(self):
        from paramugsy_tpu.formats.maf import read_xmfa

        src = os.path.join(DATA, "highly_stitchable.maf")
        blocks = list(read_maf(src))
        buf = io.StringIO()
        maf_to_xmfa(src, buf)
        buf.seek(0)
        back = list(read_xmfa(buf))
        assert len(back) == len(blocks)
        for a, b in zip(blocks, back):
            assert [(s.name, s.start, s.size, s.strand, s.src_size, s.text) for s in a.seqs] == \
                   [(s.name, s.start, s.size, s.strand, s.src_size, s.text) for s in b.seqs]


class TestMafDeltaRoundTrip:
    """maf_blocks_to_deltas is the inverse of delta_to_maf_blocks."""

    def _entries_and_seqs(self):
        import numpy as np

        from paramugsy_tpu.ops.align_pair import AlignConfig, align_pair
        from paramugsy_tpu.ops.encode import decode

        rng = np.random.default_rng(17)
        n = 8000
        ref = rng.integers(0, 4, size=n).astype(np.int8)
        q = ref.copy()
        m = rng.random(n) < 0.02
        q[m] = ((q[m] + 1) % 4).astype(np.int8)
        q = np.concatenate([q[:3000], q[3015:]])
        inv = (3 - q[5000:6000])[::-1]
        q = np.concatenate([q[:5000], inv, q[6000:]])
        entries = align_pair(ref, q, "R.c", "Q.c", AlignConfig())
        return entries, {"R.c": decode(ref)}, {"Q.c": decode(q)}

    def test_round_trip(self):
        from paramugsy_tpu.formats.delta_maf import (
            delta_to_maf_blocks,
            maf_blocks_to_deltas,
        )

        entries, rs, qs = self._entries_and_seqs()
        blocks = list(delta_to_maf_blocks(entries, rs, qs))
        back = list(maf_blocks_to_deltas(blocks))
        assert len(back) == len(entries)
        for a, b in zip(entries, back):
            assert (a.ref_range, a.query_range) == (b.ref_range, b.query_range)
            assert a.ref_gaps == b.ref_gaps and a.query_gaps == b.query_gaps
            assert (a.ref_len, a.query_len) == (b.ref_len, b.query_len)

    def test_swapped_consistent(self):
        from paramugsy_tpu.formats.delta_maf import delta_to_maf_blocks

        entries, rs, qs = self._entries_and_seqs()
        for e in entries:
            s = e.swapped()
            assert s.ref_range.is_forward
            assert s.ref_name == "Q.c" and s.query_name == "R.c"
            assert s.alignment_length() == e.alignment_length()
            # swapped entry renders valid rows over the swapped sequences
            (blk,) = delta_to_maf_blocks([s], qs, rs)
            texts = [row.text.replace("-", "") for row in blk.seqs]
            assert all(texts)


class TestTrimEntryLeft:
    """Column-space prefix trim (window-boundary de-overlap)."""

    def _entry(self, forward=True):
        from paramugsy_tpu.formats.delta import DeltaEntry

        # 10 columns: ref gap run at cols 3-4, query gap at col 7.
        return DeltaEntry(
            ref_name="R.c", query_name="Q.c", ref_len=100, query_len=100,
            ref_range=Range(11, 18),
            query_range=Range(21, 29) if forward else Range(29, 21),
            ref_gaps=[Range(3, 4)], query_gaps=[Range(7, 7)],
        )

    def test_trim_ref(self):
        from paramugsy_tpu.formats.delta import trim_entry_left

        e = trim_entry_left(self._entry(), "ref", 3)
        assert e.ref_range == Range(14, 18)
        assert e.query_range == Range(26, 29)
        assert e.ref_gaps == [] and e.query_gaps == [Range(2, 2)]
        assert e.alignment_length() == 5

    def test_trim_query_splits_other_axis_run(self):
        from paramugsy_tpu.formats.delta import trim_entry_left

        e = trim_entry_left(self._entry(), "query", 3)
        assert e.ref_range == Range(13, 18)
        assert e.query_range == Range(24, 29)
        assert e.ref_gaps == [Range(1, 1)] and e.query_gaps == [Range(4, 4)]

    def test_trim_reverse_query(self):
        from paramugsy_tpu.formats.delta import trim_entry_left

        e = trim_entry_left(self._entry(forward=False), "ref", 3)
        assert e.ref_range == Range(14, 18)
        assert e.query_range == Range(24, 21)  # high end consumed

    def test_trim_consumes_entry(self):
        from paramugsy_tpu.formats.delta import trim_entry_left

        assert trim_entry_left(self._entry(), "ref", 8) is None
        assert trim_entry_left(self._entry(), "ref", 99) is None
        got = trim_entry_left(self._entry(), "ref", 0)
        assert got.ref_range == Range(11, 18)


class TestTrimEntryRight:
    """Column-space suffix trim (margin shaving in LCB selection)."""

    def _entry(self, forward=True):
        from paramugsy_tpu.formats.delta import DeltaEntry

        # 10 columns: ref gap run at cols 3-4, query gap at col 7.
        return DeltaEntry(
            ref_name="R.c", query_name="Q.c", ref_len=100, query_len=100,
            ref_range=Range(11, 18),
            query_range=Range(21, 29) if forward else Range(29, 21),
            ref_gaps=[Range(3, 4)], query_gaps=[Range(7, 7)],
        )

    def test_trim_ref(self):
        from paramugsy_tpu.formats.delta import trim_entry_right

        e = trim_entry_right(self._entry(), "ref", 3)
        assert e.ref_range == Range(11, 15)
        assert e.query_range == Range(21, 26)
        assert e.ref_gaps == [Range(3, 4)] and e.query_gaps == [Range(7, 7)]
        assert e.alignment_length() == 7

    def test_trim_query_drops_own_gap_run(self):
        from paramugsy_tpu.formats.delta import trim_entry_right

        e = trim_entry_right(self._entry(), "query", 4)
        # removes columns 6-10: query advances at 6,8,9,10; gap col 7 gone
        assert e.ref_range == Range(11, 13)
        assert e.query_range == Range(21, 25)
        assert e.ref_gaps == [Range(3, 4)] and e.query_gaps == []
        assert e.alignment_length() == 5

    def test_trim_reverse_query(self):
        from paramugsy_tpu.formats.delta import trim_entry_right

        e = trim_entry_right(self._entry(forward=False), "ref", 3)
        assert e.ref_range == Range(11, 15)
        assert e.query_range == Range(29, 24)  # low end consumed

    def test_trim_consumes_entry(self):
        from paramugsy_tpu.formats.delta import trim_entry_right

        assert trim_entry_right(self._entry(), "ref", 8) is None
        assert trim_entry_right(self._entry(), "ref", 99) is None
        got = trim_entry_right(self._entry(), "ref", 0)
        assert got.ref_range == Range(11, 18)

    def test_left_right_roundtrip_texts(self):
        """Trimming 2 left then 3 right must keep rows renderable and
        consistent (ranges match ungapped text lengths)."""
        from paramugsy_tpu.formats.delta import (
            trim_entry_left,
            trim_entry_right,
        )

        e = trim_entry_right(trim_entry_left(self._entry(), "ref", 2), "ref", 3)
        ncols = e.alignment_length()
        assert e.ref_range.length == ncols - sum(g.length for g in e.ref_gaps)
        assert (
            e.query_range.length
            == ncols - sum(g.length for g in e.query_gaps)
        )
