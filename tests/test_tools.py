"""Tests for the MAF toolchain + CLI."""
import io
import os
import subprocess
import sys

import numpy as np
import pytest

from paramugsy_tpu.coords.range import FORWARD, REVERSE
from paramugsy_tpu.formats.maf import MafBlock, MafSequence, read_maf, write_maf
from paramugsy_tpu.tools.mafstat import compute_stats, write_stats
from paramugsy_tpu.tools.mafvalidate import find_faults
from paramugsy_tpu.tools.maf_analyzer import missing_ranges
from paramugsy_tpu.tools.maffiller import fill_blocks
from paramugsy_tpu.tools.stitch import stitch_blocks
from paramugsy_tpu.tools.misc import sort_delta_entries

DATA = os.path.join(os.path.dirname(__file__), "data")
FIXTURE = os.path.join(DATA, "highly_stitchable.maf")


class TestMafStat:
    def test_fixture_stats(self):
        st = compute_stats(FIXTURE)
        assert st.num_genomes == 4
        # 4-genome gapless blocks: 20 + 20 + 20 + 20 bp of core
        assert st.core_bp == 80
        assert st.shortest_genome == 100
        assert st.unique_bp == {"A": 2, "B": 2, "C": 2, "D": 2}
        assert st.aligned_bp["A"] == 80

    def test_write_files(self, tmp_path):
        st = compute_stats(FIXTURE)
        write_stats(st, str(tmp_path))
        core = (tmp_path / "core_genome").read_text()
        assert "num_genomes\t4" in core and "core\t80" in core
        missing = (tmp_path / "missing").read_text()
        assert "A\t80\t2\t100\t18" in missing


class TestMafValidate:
    def test_fixture_has_end_gaps_and_overlap(self):
        # fixture covers 0..79 (+ 2bp unique) of 100bp genomes -> end gaps;
        # blocks 5 and 6 genuinely overlap at positions 40-41.
        faults = find_faults(FIXTURE)
        kinds = {(f.kind, f.seq) for f in faults}
        assert ("Gap", "A") in kinds
        overlaps = [f for f in faults if f.kind == "Overlap"]
        assert {(f.start, f.end) for f in overlaps} == {(40, 41)}

    def test_clean_tiling(self):
        blocks = [
            MafBlock(seqs=[MafSequence("g.c", 0, 5, FORWARD, 10, "AAAAA")]),
            MafBlock(seqs=[MafSequence("g.c", 5, 5, FORWARD, 10, "CCCCC")]),
        ]
        assert find_faults(blocks) == []

    def test_overlap_detected(self):
        blocks = [
            MafBlock(seqs=[MafSequence("g.c", 0, 6, FORWARD, 10, "AAAAAA")]),
            MafBlock(seqs=[MafSequence("g.c", 5, 5, FORWARD, 10, "CCCCC")]),
        ]
        faults = find_faults(blocks, check_ends=False)
        assert [f.kind for f in faults] == ["Overlap"]


class TestAnalyzer:
    def test_missing(self):
        blocks = [
            MafBlock(seqs=[MafSequence("g.c", 2, 3, FORWARD, 10, "AAA")]),
            MafBlock(seqs=[MafSequence("g.c", 5, 2, FORWARD, 10, "CC")]),
        ]
        assert missing_ranges(blocks) == {"g.c": [(0, 1), (7, 9)]}


class TestFiller:
    def test_fills_gaps(self):
        blocks = [MafBlock(seqs=[MafSequence("g.c", 2, 3, FORWARD, 10, "CGT")])]
        seq = "AACGTACGTT"
        filled = fill_blocks(blocks, {"g.c": seq})
        assert find_faults(filled) == []
        texts = sorted(s.text for b in filled for s in b.seqs)
        assert texts == ["AA", "ACGTT", "CGT"]

    def test_rejects_overlap(self):
        blocks = [
            MafBlock(seqs=[MafSequence("g.c", 0, 6, FORWARD, 10, "AAAAAA")]),
            MafBlock(seqs=[MafSequence("g.c", 5, 5, FORWARD, 10, "CCCCC")]),
        ]
        with pytest.raises(ValueError):
            fill_blocks(blocks, {"g.c": "A" * 10})


class TestStitch:
    def test_fixture_stitches_adjacent_multiblocks(self):
        blocks = list(read_maf(FIXTURE))
        out = stitch_blocks(blocks)
        # blocks 6 and 7 (A/C/D forward advancing, B reverse advancing) merge
        assert len(out) == len(blocks) - 1
        merged = [b for b in out if len(b.seqs) == 4 and b.seqs[0].size == 40]
        assert len(merged) == 1
        m = merged[0]
        brow = [s for s in m.seqs if s.name == "B"][0]
        assert brow.strand == REVERSE and brow.start == 20 and brow.size == 40
        assert len(brow.text) == 40

    def test_no_stitch_when_strand_differs(self):
        b1 = MafBlock(seqs=[MafSequence("g.c", 0, 5, FORWARD, 20, "AAAAA")])
        b2 = MafBlock(seqs=[MafSequence("g.c", 5, 5, REVERSE, 20, "CCCCC")])
        assert len(stitch_blocks([b1, b2])) == 2

    def test_chain_of_three(self):
        bs = [
            MafBlock(seqs=[
                MafSequence("x.c", i * 4, 4, FORWARD, 12, "AAAA"),
                MafSequence("y.c", i * 4, 4, FORWARD, 12, "CCCC"),
            ])
            for i in range(3)
        ]
        out = stitch_blocks(bs)
        assert len(out) == 1
        assert out[0].seqs[0].size == 12


class TestSortDelta:
    def test_ordering(self):
        from paramugsy_tpu.coords.range import Range
        from paramugsy_tpu.formats.delta import DeltaEntry

        e1 = DeltaEntry("b", "q", 10, 10, Range(5, 9), Range(1, 5), [], [])
        e2 = DeltaEntry("a", "q", 10, 10, Range(5, 9), Range(1, 5), [], [])
        e3 = DeltaEntry("a", "q", 10, 10, Range(1, 5), Range(1, 5), [], [])
        assert sort_delta_entries([e1, e2, e3]) == [e3, e2, e1]


class TestCli:
    def run_cli(self, *args):
        from paramugsy_tpu.cli import main

        return main(list(args))

    def test_mafvalidate_exit_code(self, tmp_path):
        assert self.run_cli("mafvalidate", FIXTURE) == 1  # end gaps
        clean = tmp_path / "clean.maf"
        write_maf(str(clean), [
            MafBlock(seqs=[MafSequence("g.c", 0, 4, FORWARD, 4, "ACGT")])
        ])
        assert self.run_cli("mafvalidate", str(clean)) == 0

    def test_mafdefrag(self, tmp_path, capsys):
        out = tmp_path / "out.maf"
        assert self.run_cli("mafdefrag", FIXTURE, str(out)) == 0
        assert len(list(read_maf(str(out)))) == 7

    def test_mafstat(self, tmp_path, capsys):
        assert self.run_cli("mafstat", FIXTURE, "-out_dir", str(tmp_path)) == 0
        assert (tmp_path / "core_genome").exists()

    def test_profiles_round_trip(self, tmp_path):
        fa = tmp_path / "g.fa"
        fa.write_text(">g.c1\nACGTACGT\n")
        maf = tmp_path / "g.maf"
        assert self.run_cli(
            "profiles", "fasta_to_maf", "-in_fasta", str(fa), "-out_maf", str(maf)
        ) == 0
        assert self.run_cli(
            "profiles", "make", "-basename", "x", "-out_dir",
            str(tmp_path / "p"), "-in_maf", str(maf),
        ) == 0
        assert (tmp_path / "p" / "profiles").exists()
        assert (tmp_path / "p" / "sequences.fasta").exists()

    def test_nucmer_cli(self, tmp_path):
        rng = np.random.default_rng(5)
        s = "".join(np.array(list("ACGT"))[rng.integers(4, size=2000)])
        (tmp_path / "a.fa").write_text(f">c\n{s}\n")
        (tmp_path / "b.fa").write_text(f">c\n{s[100:1900]}\n")
        out_delta = tmp_path / "o.delta"
        out_maf = tmp_path / "o.maf"
        rc = self.run_cli(
            "nucmer", "-ref_seq", str(tmp_path / "a.fa"),
            "-query_seq", str(tmp_path / "b.fa"),
            "-out_delta", str(out_delta), "-out_maf", str(out_maf),
        )
        assert rc == 0
        from paramugsy_tpu.formats.delta import read_delta

        entries = list(read_delta(str(out_delta)))
        assert entries and entries[0].ref_range.length >= 1700
        assert list(read_maf(str(out_maf)))


class TestCliEdges:
    def run_cli(self, *args):
        from paramugsy_tpu.cli import main

        return main(list(args))

    def test_seq_list_input(self, tmp_path):
        rng = np.random.default_rng(2)
        s = "".join(np.array(list("ACGT"))[rng.integers(4, size=1500)])
        a = tmp_path / "a.fasta"; a.write_text(f">c\n{s}\n")
        b = tmp_path / "b.fasta"; b.write_text(f">c\n{s[50:1450]}\n")
        lst = tmp_path / "seqs.txt"
        lst.write_text(f"{a}\n{b}\n")
        out = tmp_path / "o.maf"
        assert self.run_cli("align", "-seq_list", str(lst), "-out_maf", str(out)) == 0
        assert list(read_maf(str(out)))

    def test_single_genome(self, tmp_path):
        fa = tmp_path / "solo.fasta"
        fa.write_text(">c1\nACGTACGTAC\n>c2\nTTTTCCCC\n")
        out = tmp_path / "solo.maf"
        assert self.run_cli("align", str(fa), "-out_maf", str(out)) == 0
        blocks = list(read_maf(str(out)))
        assert len(blocks) == 2  # one block per contig
        assert {b.seqs[0].name for b in blocks} == {"solo.c1", "solo.c2"}

    def test_no_input_errors(self, capsys):
        import pytest as _pytest

        with _pytest.raises(SystemExit):
            self.run_cli("align", "-out_maf", "/tmp/x.maf")


class TestSynchain:
    """Synchain edge-file writer + chained reader/verifier (the stages the
    reference's mafdefrag left stubbed)."""

    def test_write_synchain_edges(self, tmp_path):
        import io

        from paramugsy_tpu.formats.maf import read_maf
        from paramugsy_tpu.tools.synchain import write_synchain

        blocks = list(read_maf("tests/data/highly_stitchable.maf"))
        buf = io.StringIO()
        write_synchain(blocks, buf)
        lines = [l.split() for l in buf.getvalue().splitlines()]
        assert lines
        for cols in lines:
            assert len(cols) == 11
            idxl, idxr = int(cols[0]), int(cols[1])
            assert 0 <= idxl < len(blocks) and 0 <= idxr < len(blocks)
            s1s, s1e, s2s, s2e = map(int, cols[7:11])
            dist = int(cols[3])
            assert dist == s2s - s1e  # real distance (reference bug fixed)
            assert cols[5] in "+-" and cols[6] in "+-"
        # the fixture's adjacent blocks are contiguous: dist 1 edges exist
        assert any(int(c[3]) == 1 for c in lines)

    def test_chained_round_trip_and_verify(self):
        import io

        from paramugsy_tpu.tools.synchain import read_chained, verify_chains

        text = (
            "V 120\n"
            "I 0 + 10-20 1 - 30-40 ;\n"
            "I 0 + 20-25 ;\n"
        )
        chains = read_chained(io.StringIO(text))
        assert len(chains) == 2
        assert chains[0][0].start == 10 and chains[0][0].end == 19
        assert chains[0][1].forward is False
        # accession 0: [10,19] then [20,24] -> contiguous; accession 1 single
        assert verify_chains(chains) == []
        bad = read_chained(io.StringIO("I 0 + 10-20 0 + 25-30 ;\n"))
        assert len(verify_chains(bad)) == 1

    def test_mafdefrag_cli_flags(self, tmp_path):
        from paramugsy_tpu.cli import main as cli_main

        out = str(tmp_path / "out.maf")
        edges = str(tmp_path / "edges.txt")
        rc = cli_main(
            ["mafdefrag", "tests/data/highly_stitchable.maf", out,
             "-synchain", edges]
        )
        assert rc == 0
        assert open(edges).read().strip()
        bad = tmp_path / "bad_chain.txt"
        bad.write_text("I 0 + 10-20 0 + 25-30 ;\n")
        rc = cli_main(
            ["mafdefrag", "tests/data/highly_stitchable.maf", out,
             "-chained", str(bad)]
        )
        assert rc == 1
