"""MSA refinement (lcb/refine.py — the mugsyWGA --refine role)."""
import numpy as np
import pytest

from paramugsy_tpu.coords.range import FORWARD, REVERSE
from paramugsy_tpu.formats.maf import MafBlock, MafSequence
from paramugsy_tpu.lcb.refine import (
    GAP_CODE,
    consensus_codes,
    matrix_rows,
    refine_block,
    refine_matrix,
    rows_matrix,
    sp_score,
)
from paramugsy_tpu.ops.extend import Scoring


def mk_block(texts, starts=None, strands=None):
    seqs = []
    for i, t in enumerate(texts):
        size = len(t.replace("-", ""))
        seqs.append(
            MafSequence(
                name=f"g{i}.c", start=(starts or [0] * len(texts))[i], size=size,
                strand=(strands or [FORWARD] * len(texts))[i],
                src_size=size + 10, text=t,
            )
        )
    return MafBlock(seqs=seqs, score=0, attrs={})


class TestScore:
    def test_identical_rows(self):
        m = rows_matrix(["ACGT", "ACGT", "ACGT"])
        # 3 pairs x 4 cols x match(2)
        assert sp_score(m) == 3 * 4 * 2

    def test_mismatch_and_gap(self):
        s = Scoring(match=2, mismatch=-3, gap=-4)
        m = rows_matrix(["AC", "A-"])
        assert sp_score(m, s) == 2 - 4
        m2 = rows_matrix(["AC", "AG"])
        assert sp_score(m2, s) == 2 - 3

    def test_gap_gap_free(self):
        m = rows_matrix(["A-", "A-"])
        assert sp_score(m) == 2

    def test_round_trip_matrix(self):
        texts = ["AC-GT", "ACCGT", "A--GT"]
        assert matrix_rows(rows_matrix(texts)) == texts


class TestConsensus:
    def test_majority(self):
        m = rows_matrix(["ACGT", "ACGA", "ACCA"])
        c = consensus_codes(m)
        assert c[0] == 0 and c[1] == 1 and c[3] == 0

    def test_ignores_gaps(self):
        m = rows_matrix(["A--", "-C-", "AC-"])
        c = consensus_codes(m[:, :2])
        assert c[0] == 0 and c[1] == 1


class TestRefineMatrix:
    def test_fixes_shifted_gap(self):
        # Optimal alignment has the gap in row 2 aligned under the deleted G.
        good = ["ACGTACGT", "ACGTACGT", "ACGTAC-T"]
        bad = ["ACGTACGT", "ACGTACGT", "ACGTA-CT"]
        m = refine_matrix(rows_matrix(bad))
        assert sp_score(m) >= sp_score(rows_matrix(good)) - 1
        assert sp_score(m) > sp_score(rows_matrix(bad))

    def test_preserves_row_content(self):
        rng = np.random.default_rng(0)
        base = "".join(rng.choice(list("ACGT"), 200))
        rows = [base, base[:80] + base[90:], base[:40] + "TTTT" + base[40:]]
        # build a deliberately sloppy alignment by padding to equal width
        w = max(len(r) for r in rows)
        texts = [r + "-" * (w - len(r)) for r in rows]
        m = refine_matrix(rows_matrix(texts), rounds=2)
        out = matrix_rows(m)
        for orig, new in zip(rows, out):
            assert new.replace("-", "") == orig

    def test_never_decreases_sp(self):
        rng = np.random.default_rng(1)
        for _ in range(5):
            n = rng.integers(2, 5)
            w = int(rng.integers(10, 60))
            rows = []
            for _ in range(n):
                chars = rng.choice(list("ACGT-"), w, p=[0.22, 0.22, 0.22, 0.22, 0.12])
                rows.append("".join(chars))
            # ensure no all-gap rows
            rows = [r if r.strip("-") else "A" * w for r in rows]
            m0 = rows_matrix(rows)
            m1 = refine_matrix(m0.copy())
            assert sp_score(m1) >= sp_score(m0)

    def test_drops_all_gap_columns(self):
        m = refine_matrix(rows_matrix(["A-C", "A-C"]))
        assert m.shape[1] == 2
        assert not (m == GAP_CODE).all(axis=0).any()


class TestRefineBlock:
    def test_coordinates_untouched(self):
        b = mk_block(["ACGTA-CT", "ACGTAC-T"], starts=[5, 9], strands=[FORWARD, REVERSE])
        before = [(s.name, s.start, s.size, s.strand, s.src_size) for s in b.seqs]
        ungapped = [s.text.replace("-", "") for s in b.seqs]
        refine_block(b)
        assert [(s.name, s.start, s.size, s.strand, s.src_size) for s in b.seqs] == before
        assert [s.text.replace("-", "") for s in b.seqs] == ungapped
        assert len({len(s.text) for s in b.seqs}) == 1

    def test_single_row_noop(self):
        b = mk_block(["ACGT"])
        t = b.seqs[0].text
        refine_block(b)
        assert b.seqs[0].text == t

    def test_max_cols_gate(self):
        b = mk_block(["ACGTA-CT", "ACGTAC-T"])
        t = [s.text for s in b.seqs]
        refine_block(b, max_cols=4)
        assert [s.text for s in b.seqs] == t


class TestPipelineRefine:
    def test_end_to_end_refine(self, tmp_path):
        from paramugsy_tpu.pipeline import Aligner, Genome, PipelineConfig, finalize_blocks
        from paramugsy_tpu.tools.mafstat import compute_stats
        from paramugsy_tpu.tools.mafvalidate import find_faults

        rng = np.random.default_rng(7)
        base = "".join(rng.choice(list("ACGT"), 4000))

        def mutate(s):
            out = []
            for ch in s:
                r = rng.random()
                if r < 0.01:
                    continue
                if r < 0.03:
                    out.append(rng.choice(list("ACGT")))
                else:
                    out.append(ch)
            return "".join(out)

        genomes = [
            Genome(name=f"g{i}", seqs={f"g{i}.c1": mutate(base)}) for i in range(3)
        ]
        plain = finalize_blocks(Aligner(genomes, PipelineConfig()).run())
        refined = finalize_blocks(
            Aligner(genomes, PipelineConfig(refine=True)).run()
        )
        assert not find_faults(refined)
        sp_plain = compute_stats(plain).sp_identity
        sp_ref = compute_stats(refined).sp_identity
        assert sp_ref >= sp_plain - 1e-9
        # rows still carry true genome substrings
        for b in refined:
            for s in b.seqs:
                gname, _ = s.name.split(".", 1)
                seq = genomes[int(gname[1])].seqs[s.name]
                txt = s.text.replace("-", "")
                if s.strand == FORWARD:
                    assert txt == seq[s.start : s.start + s.size]
