"""End-to-end pipeline tests: guide tree, job tree, merge, full alignment."""
import numpy as np
import pytest

from paramugsy_tpu.formats.maf import read_maf
from paramugsy_tpu.ops.encode import encode
from paramugsy_tpu.pipeline import Aligner, Genome, PipelineConfig, align_fastas, load_genome
from paramugsy_tpu.tree.distance import distance_matrix
from paramugsy_tpu.tree.guide_tree import parse_newick, upgma
from paramugsy_tpu.tree.job_tree import make_job_tree

_COMP = str.maketrans("ACGT", "TGCA")


def rand_dna(rng, n):
    return "".join(np.array(list("ACGT"))[rng.integers(4, size=n)])


def mutate(rng, s, sub=0.02, indels=3):
    s = list(s)
    for i in rng.choice(len(s), int(len(s) * sub), replace=False):
        s[i] = "ACGT"[rng.integers(4)]
    s = "".join(s)
    for _ in range(indels):
        p = int(rng.integers(100, len(s) - 100))
        if rng.random() < 0.5:
            s = s[:p] + s[p + int(rng.integers(1, 12)):]
        else:
            s = s[:p] + rand_dna(rng, int(rng.integers(1, 12))) + s[p:]
    return s


class TestBatchedPairs:
    def test_batch_matches_per_pair(self):
        """align_pairs_batch (one vmapped dispatch per bucket group) must
        produce exactly the per-pair align_pair results."""
        from paramugsy_tpu.ops.align_pair import (
            AlignConfig,
            align_pair,
            align_pairs_batch,
        )

        rng = np.random.default_rng(23)
        base = rand_dna(rng, 3000)
        seqs = [base] + [mutate(rng, base) for _ in range(3)]
        seqs.append(rand_dna(rng, 1200))  # different bucket
        cfg = AlignConfig()
        jobs = []
        for i in range(len(seqs)):
            for j in range(i + 1, len(seqs)):
                jobs.append((seqs[i], seqs[j], f"g{i}.c", f"g{j}.c"))
        batched = align_pairs_batch(jobs, cfg, device_cache={})
        for (a, b, rn, qn), got in zip(jobs, batched):
            single = align_pair(a, b, rn, qn, cfg, device_cache={})
            assert got == single, f"{rn}~{qn} diverged"

    def test_executor_uses_batched_dispatch(self, tmp_path):
        """The chunked executor path and the sequential Aligner agree."""
        from paramugsy_tpu.runtime.executor import JobExecutor

        rng = np.random.default_rng(29)
        base = rand_dna(rng, 2000)
        genomes = [
            Genome(name=f"g{i}", seqs={f"g{i}.chr": mutate(rng, base)})
            for i in range(4)
        ]
        cfg = PipelineConfig()
        tree = Aligner(genomes, cfg).job_tree()
        seq_blocks = Aligner(genomes, cfg).run()
        ex = JobExecutor(genomes, cfg, run_size=2, chunk_size=4)
        conc_blocks = ex.execute(tree)
        key = lambda bs: sorted(
            (s.name, s.start, s.size, s.text) for b in bs for s in b.seqs
        )
        assert key(conc_blocks) == key(seq_blocks)


class TestDistance:
    def test_closer_genomes_smaller_distance(self):
        rng = np.random.default_rng(0)
        a = rand_dna(rng, 3000)
        near = mutate(rng, a, sub=0.01, indels=0)
        far = rand_dna(rng, 3000)
        d = distance_matrix([encode(a), encode(near), encode(far)])
        assert d[0, 1] < d[0, 2]
        assert d[0, 0] == 0
        assert np.allclose(d, d.T)


class TestGuideTree:
    def test_upgma_groups_similar(self):
        # distances: a,b close; c,d close; two groups far apart
        d = np.array([
            [0.0, 0.1, 0.9, 0.9],
            [0.1, 0.0, 0.9, 0.9],
            [0.9, 0.9, 0.0, 0.1],
            [0.9, 0.9, 0.1, 0.0],
        ])
        t = upgma(d, ["a", "b", "c", "d"])
        leaves = t.leaves()
        assert {tuple(sorted(leaves[:2])), tuple(sorted(leaves[2:]))} == {
            ("a", "b"), ("c", "d")
        }

    def test_newick_round_trip(self):
        t = parse_newick("((a:0.1,b:0.2)x:0.3,(c,d));")
        assert t.leaves() == ["a", "b", "c", "d"]
        assert parse_newick(t.to_newick()).leaves() == t.leaves()


class TestJobTree:
    def test_recursive_halving(self):
        jt = make_job_tree(list("abcdefg"), 2)
        assert jt.kind == "profile"
        assert jt.to_list() == list("abcdefg")
        # 7 -> 3 + 4 -> (1+2) + (2+2)
        assert jt.left.to_list() == list("abc")
        assert jt.left.left.kind == "fake_mugsy"

    def test_pairwise_counts(self):
        jt = make_job_tree(list("abcdefg"), 2)
        pairs = jt.all_pairwise()
        # every unordered pair exactly once across the whole tree
        assert len(pairs) == 21
        assert len({tuple(sorted(p)) for p in pairs}) == 21

    def test_leaf_pairwise_all_pairs(self):
        jt = make_job_tree(list("abc"), 4)
        assert jt.kind == "mugsy"
        assert jt.pairwise() == [("a", "b"), ("a", "c"), ("b", "c")]


@pytest.fixture(scope="module")
def four_genome_run(tmp_path_factory):
    rng = np.random.default_rng(42)
    anc = rand_dna(rng, 5000)
    d = tmp_path_factory.mktemp("genomes")
    paths = []
    genomes = {}
    for name in ["alpha", "beta", "gamma", "zeta"]:
        g = mutate(rng, anc)
        (d / f"{name}.fasta").write_text(f">chr1\n{g}\n")
        genomes[f"{name}.chr1"] = g
        paths.append(str(d / f"{name}.fasta"))
    out = str(d / "out.maf")
    blocks = align_fastas(paths, out, PipelineConfig())
    return genomes, blocks, out


class TestEndToEnd:
    def test_full_single_coverage(self, four_genome_run):
        genomes, blocks, _ = four_genome_run
        cov = {n: np.zeros(len(s), int) for n, s in genomes.items()}
        for b in blocks:
            for s in b.seqs:
                fs, fe = s.forward_interval()
                cov[s.name][fs : fe + 1] += 1
        for n, c in cov.items():
            assert (c == 1).all(), f"{n}: coverage faults (mafvalidate role)"

    def test_rows_carry_true_sequence(self, four_genome_run):
        genomes, blocks, _ = four_genome_run
        for b in blocks:
            for s in b.seqs:
                bare = s.text.replace("-", "")
                g = genomes[s.name]
                if s.strand == 1:
                    expect = g[s.start : s.start + s.size]
                else:
                    expect = g.translate(_COMP)[::-1][s.start : s.start + s.size]
                assert bare == expect

    def test_multi_genome_blocks_exist(self, four_genome_run):
        genomes, blocks, _ = four_genome_run
        mult4 = sum(1 for b in blocks if len(b.seqs) == 4)
        total4 = sum(
            len(b.seqs[0].text) for b in blocks if len(b.seqs) == 4
        )
        assert mult4 >= 1
        # most of the (highly similar) genomes should align 4-way
        assert total4 > 0.8 * min(len(g) for g in genomes.values())

    def test_output_file_parses(self, four_genome_run):
        _, blocks, out = four_genome_run
        reread = list(read_maf(out))
        assert len(reread) == len(blocks)

    def test_block_columns_consistent(self, four_genome_run):
        _, blocks, _ = four_genome_run
        for b in blocks:
            widths = {len(s.text) for s in b.seqs}
            assert len(widths) == 1
            for s in b.seqs:
                assert len(s.text.replace("-", "")) == s.size


class TestEightGenomes:
    def test_deep_tree(self, tmp_path):
        """Three-level merge tree: 8 genomes, coverage + content invariants."""
        rng = np.random.default_rng(77)
        anc = rand_dna(rng, 2500)
        genomes = {}
        paths = []
        for i in range(8):
            g = mutate(rng, anc, sub=0.015, indels=2)
            name = f"s{i}"
            (tmp_path / f"{name}.fasta").write_text(f">chr\n{g}\n")
            genomes[f"{name}.chr"] = g
            paths.append(str(tmp_path / f"{name}.fasta"))
        blocks = align_fastas(paths, str(tmp_path / "o.maf"), PipelineConfig())
        from paramugsy_tpu.tools.mafvalidate import find_faults

        assert find_faults(blocks) == []
        # deep-tree content check: every row still carries true sequence
        for b in blocks:
            for s in b.seqs:
                bare = s.text.replace("-", "")
                g = genomes[s.name]
                expect = (
                    g[s.start : s.start + s.size]
                    if s.strand == 1
                    else g.translate(_COMP)[::-1][s.start : s.start + s.size]
                )
                assert bare == expect
        # most of the alignment should be 8-way
        total8 = sum(len(b.seqs[0].text) for b in blocks if len(b.seqs) == 8)
        assert total8 > 0.5 * len(anc), f"8-way core only {total8}bp"


class TestQuality:
    def test_sp_identity_tracks_true_divergence(self, tmp_path):
        """Aligned columns must be true homologs: SP identity ~= sequence
        identity implied by the planted mutation rate."""
        from paramugsy_tpu.pipeline import Aligner, Genome
        from paramugsy_tpu.tools.mafstat import compute_stats

        rng = np.random.default_rng(9)
        n = 6000
        anc = rand_dna(rng, n)
        rate = 0.01
        genomes = []
        for i in range(4):
            s = list(anc)
            for j in rng.choice(n, int(n * rate), replace=False):
                s[j] = "ACGT"[rng.integers(4)]
            genomes.append(Genome(f"q{i}", {f"q{i}.chr": "".join(s)}))
        blocks = Aligner(genomes, PipelineConfig()).run()
        st = compute_stats(blocks)
        # expected pairwise identity ~ (1 - 2*rate*(3/4 correction)) ~ 0.985
        assert st.sp_identity > 0.97
        assert st.sp_pairs_compared > 0.9 * 6 * n  # near-full 4-way coverage


class TestDuplications:
    """-duplications / -dup_list roles: dup blocks appended, labeled, and
    excluded from coverage validation."""

    def _fastas(self, tmp_path):
        rng = np.random.default_rng(9)
        anc = rand_dna(rng, 8000)
        # plant a direct duplication in the ancestor so every genome has it
        anc = anc[:6000] + anc[1000:1800] + anc[6000:]
        paths = []
        for name in ["alpha", "beta"]:
            g = mutate(rng, anc)
            (tmp_path / f"{name}.fasta").write_text(f">chr1\n{g}\n")
            paths.append(str(tmp_path / f"{name}.fasta"))
        return paths

    def test_duplications_flag(self, tmp_path):
        from paramugsy_tpu.tools.mafvalidate import find_faults

        paths = self._fastas(tmp_path)
        out = str(tmp_path / "out.maf")
        cfg = PipelineConfig(duplications=True)
        blocks = align_fastas(paths, out, cfg)
        dups = [b for b in blocks if b.attrs["label"].startswith("dup")]
        main = [b for b in blocks if not b.attrs["label"].startswith("dup")]
        assert dups, "planted duplication not detected"
        for b in dups:
            assert len(b.seqs) == 2
            assert b.seqs[0].name == b.seqs[1].name  # self-pair
        # dup blocks do not break the 1-1 coverage validation
        assert find_faults(blocks) == []
        assert find_faults(out) == []
        # labels: main sequential, dups dupN
        assert [b.attrs["label"] for b in main] == [
            str(i + 1) for i in range(len(main))
        ]
        assert [b.attrs["label"] for b in dups] == [
            f"dup{i + 1}" for i in range(len(dups))
        ]

    def test_dup_list_passthrough(self, tmp_path):
        from paramugsy_tpu.formats.maf import read_maf

        paths = self._fastas(tmp_path)
        # precompute dups for genome alpha via the repeats role
        from paramugsy_tpu.cli import main as cli_main

        dup_maf = str(tmp_path / "alpha_dups.maf")
        rc = cli_main(["repeats", "-seq", paths[0], "-out_maf", dup_maf])
        assert rc == 0
        lst = tmp_path / "dups.list"
        lst.write_text(dup_maf + "\n")
        out = str(tmp_path / "out2.maf")
        rc = cli_main(
            ["align", *paths, "-out_maf", out, "-sequential",
             "-dup_list", str(lst)]
        )
        assert rc == 0
        blocks = list(read_maf(out))
        assert any(b.attrs["label"].startswith("dup") for b in blocks)


class TestSpScores:
    """Block scores are sum-of-pairs alignment scores (VERDICT r4 #6:
    score must track quality, not max row length)."""

    def test_exact_small(self):
        from paramugsy_tpu.lcb.score import sp_score_rows
        from paramugsy_tpu.ops.extend import Scoring

        sc = Scoring()  # match=2, mismatch=-3, gap=-4
        # col1: AA match; col2: AC mismatch; col3: A- gap; col4: -- zero;
        # col5: AN ambiguous -> 0
        rows = ["AAA-A", "ACG-N", "AC-G-"]
        # col-by-col pairs (3 rows = 3 pairs/col):
        # c0 A/A/A: 3 match          -> +6
        # c1 A/C/C: 1 match 2 mis    -> +2 -6
        # c2 A/G/-: 1 mis 2 gap      -> -3 -8
        # c3 -/-/G: 2 gap            -> -8
        # c4 A/N/-: N pairs 0, A-  gap -> -4
        assert sp_score_rows(rows, sc) == 6 + (2 - 6) + (-3 - 8) + (-8) + (-4)

    def test_single_row_zero(self):
        from paramugsy_tpu.lcb.score import sp_score_rows

        assert sp_score_rows(["ACGT"]) == 0

    def test_monotone_with_identity(self):
        """Higher-identity alignments of the same shape score higher."""
        from paramugsy_tpu.lcb.score import sp_score_rows

        base = "ACGTACGTACGTACGTACGT" * 10
        worse = "TGCA" + base[4:]
        assert sp_score_rows([base, base]) > sp_score_rows([base, worse])

    def test_finalize_assigns_sp_scores(self):
        from paramugsy_tpu.formats.maf import MafBlock, MafSequence
        from paramugsy_tpu.coords.range import FORWARD
        from paramugsy_tpu.lcb.score import sp_score_rows
        from paramugsy_tpu.pipeline import finalize_blocks

        rows = ["ACGTAC", "ACGTAC"]
        b = MafBlock(
            seqs=[
                MafSequence(
                    name=f"g{i}.c", start=0, size=6, strand=FORWARD,
                    src_size=6, text=t,
                )
                for i, t in enumerate(rows)
            ],
            score=999,
            attrs={},
        )
        (out,) = finalize_blocks([b])
        # 6 columns x 1 row-pair, all matches at +2
        assert out.score == sp_score_rows(rows) == 12
