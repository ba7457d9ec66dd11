"""Tests for mode flags (skipunique/colinear/duplications parity) and
robustness: multi-contig genomes, N runs, empty inputs."""
import numpy as np
import pytest

from paramugsy_tpu.coords.range import Range
from paramugsy_tpu.formats.delta import DeltaEntry
from paramugsy_tpu.ops.align_pair import align_pair, filter_colinear
from paramugsy_tpu.pipeline import Aligner, Genome, PipelineConfig
from paramugsy_tpu.tools.mafvalidate import find_faults

_COMP = str.maketrans("ACGT", "TGCA")


def rand_dna(rng, n):
    return "".join(np.array(list("ACGT"))[rng.integers(4, size=n)])


class TestFilterColinear:
    def mk(self, rs, re_, qs, qe):
        return DeltaEntry("r", "q", 1000, 1000, Range(rs, re_), Range(qs, qe), [], [])

    def test_keeps_monotone_chain(self):
        entries = [
            self.mk(1, 100, 1, 100),
            self.mk(200, 300, 200, 300),
            self.mk(150, 170, 500, 520),  # breaks colinearity; lighter
        ]
        out = filter_colinear(entries)
        assert [e.ref_range.start for e in out] == [1, 200]

    def test_picks_heavier_orientation(self):
        entries = [
            self.mk(1, 50, 1, 50),
            self.mk(100, 400, 400, 100),  # reverse, heavier
        ]
        out = filter_colinear(entries)
        assert len(out) == 1 and not out[0].query_range.is_forward


class TestSkipUnique:
    def test_skipunique_drops_single_coverage(self):
        rng = np.random.default_rng(3)
        anc = rand_dna(rng, 3000)
        # two genomes sharing only the middle third
        a = rand_dna(rng, 1000) + anc[1000:2000] + rand_dna(rng, 1000)
        b = rand_dna(rng, 500) + anc[1000:2000] + rand_dna(rng, 500)
        genomes = [
            Genome("ga", {"ga.c": a}),
            Genome("gb", {"gb.c": b}),
        ]
        full = Aligner(genomes, PipelineConfig()).run()
        skinny = Aligner(
            [Genome("ga", {"ga.c": a}), Genome("gb", {"gb.c": b})],
            PipelineConfig(emit_unique=False),
        ).run()
        # full output tiles both genomes; skipunique has coverage gaps
        assert find_faults(full) == []
        assert any(f.kind == "Gap" for f in find_faults(skinny))
        # and all remaining blocks are 2-genome alignments
        assert all(len(b_.seqs) >= 2 for b_ in skinny)


class TestRobustness:
    def test_multi_contig_genomes(self):
        rng = np.random.default_rng(5)
        anc1, anc2 = rand_dna(rng, 1500), rand_dna(rng, 1200)

        def mutate(s):
            t = list(s)
            for j in rng.choice(len(s), len(s) // 60, replace=False):
                t[j] = "ACGT"[rng.integers(4)]
            return "".join(t)

        g1 = Genome("x", {"x.c1": mutate(anc1), "x.c2": mutate(anc2)})
        g2 = Genome("y", {"y.c1": mutate(anc1), "y.c2": mutate(anc2)})
        blocks = Aligner([g1, g2], PipelineConfig()).run()
        assert find_faults(blocks) == []
        # cross-contig homology found for both contigs
        pairs = {
            frozenset(s.name for s in b.seqs) for b in blocks if len(b.seqs) == 2
        }
        assert frozenset({"x.c1", "y.c1"}) in pairs
        assert frozenset({"x.c2", "y.c2"}) in pairs

    def test_n_runs_are_tolerated(self):
        rng = np.random.default_rng(6)
        anc = rand_dna(rng, 2000)
        a = anc[:900] + "N" * 50 + anc[950:]
        b = anc
        entries = align_pair(a, b, "a.c", "b.c")
        assert entries
        covered = np.zeros(len(a), bool)
        for e in entries:
            r = e.ref_range.abs()
            covered[r.start - 1 : r.end] = True
        # everything except around the N island aligns
        assert covered[:880].mean() > 0.95
        assert covered[1020:].mean() > 0.95

    def test_identical_tiny(self):
        entries = align_pair("ACGTACGTACGTACGTACGTACGT", "ACGTACGTACGTACGTACGTACGT",
                             "a.c", "b.c")
        # repetitive tiny sequence: unique-ref filter may drop everything,
        # but the call must not crash and entries must be valid
        for e in entries:
            assert e.ref_range.length >= 1

    def test_no_homology(self):
        rng = np.random.default_rng(8)
        a, b = rand_dna(rng, 1500), rand_dna(rng, 1500)
        entries = align_pair(a, b, "a.c", "b.c")
        total = sum(e.ref_range.length for e in entries)
        assert total < 300, "random sequences should produce little alignment"


class TestPostFilterAndRetries:
    def test_post_filter_one_to_one(self):
        from paramugsy_tpu.ops.align_pair import AlignConfig, align_pair

        rng = np.random.default_rng(12)
        s = rand_dna(rng, 3000)
        cfg = AlignConfig(post_filter="one_to_one")
        entries = align_pair(s, s, "a.c", "b.c", cfg)
        last = 0
        for e in entries:
            assert e.ref_range.abs().start > last
            last = e.ref_range.abs().end

    def test_post_filter_unknown_raises(self):
        from paramugsy_tpu.ops.align_pair import AlignConfig, align_pair

        with pytest.raises(ValueError):
            align_pair("ACGT" * 200, "ACGT" * 200, "a", "b",
                       AlignConfig(post_filter="bogus"))

    def test_executor_retries_transient_faults(self):
        from paramugsy_tpu.pipeline import Aligner, Genome, PipelineConfig
        from paramugsy_tpu.runtime.executor import JobExecutor

        rng = np.random.default_rng(3)
        s = rand_dna(rng, 2000)
        genomes = [Genome("a", {"a.c": s}), Genome("b", {"b.c": s})]
        cfg = PipelineConfig()
        ex = JobExecutor(genomes, cfg, run_size=2, retries=3)
        fails = {"n": 0}
        orig = ex._pair_deltas

        def flaky(a, b):
            if fails["n"] < 2:
                fails["n"] += 1
                raise RuntimeError("transient device error")
            return orig(a, b)

        ex._pair_deltas = flaky
        tree = Aligner(genomes, cfg).job_tree()
        blocks = ex.execute(tree)
        assert blocks and fails["n"] == 2


class TestMugsySubcommand:
    """The mugsy_mugsy worker role: -seq_list + -maf_list -> merged MAF."""

    def test_mugsy_with_precomputed_mafs(self, tmp_path):
        import numpy as np

        from paramugsy_tpu.cli import main as cli_main
        from paramugsy_tpu.formats.maf import read_maf
        from paramugsy_tpu.tools.mafvalidate import find_faults

        rng = np.random.default_rng(23)
        bases = "ACGT"
        anc = "".join(bases[i] for i in rng.integers(4, size=4000))
        paths = []
        for name in ("p1", "p2"):
            s = list(anc)
            for j in rng.choice(len(s), 40, replace=False):
                s[j] = bases[rng.integers(4)]
            (tmp_path / f"{name}.fa").write_text(f">chr\n{''.join(s)}\n")
            paths.append(str(tmp_path / f"{name}.fa"))
        (tmp_path / "seqs.list").write_text("\n".join(paths) + "\n")

        # precompute the pairwise MAF with the nucmer role
        pair_maf = str(tmp_path / "pair.maf")
        rc = cli_main(
            ["nucmer", "-ref_seq", paths[0], "-query_seq", paths[1],
             "-out_maf", pair_maf]
        )
        assert rc == 0
        (tmp_path / "mafs.list").write_text(pair_maf + "\n")

        rc = cli_main(
            ["mugsy", "-out_dir", str(tmp_path / "out"), "-basename", "m",
             "-seq_list", str(tmp_path / "seqs.list"),
             "-maf_list", str(tmp_path / "mafs.list")]
        )
        assert rc == 0
        blocks = list(read_maf(str(tmp_path / "out" / "m.maf")))
        assert blocks and find_faults(blocks) == []
        assert any(len(b.seqs) == 2 for b in blocks)


class TestGuideTreeAndSge:
    def _fastas(self, tmp_path):
        import numpy as np

        rng = np.random.default_rng(31)
        bases = "ACGT"
        anc = "".join(bases[i] for i in rng.integers(4, size=3000))
        paths = []
        for name in ("ga", "gb", "gc"):
            s = list(anc)
            for j in rng.choice(len(s), 30, replace=False):
                s[j] = bases[rng.integers(4)]
            (tmp_path / f"{name}.fa").write_text(f">chr\n{''.join(s)}\n")
            paths.append(str(tmp_path / f"{name}.fa"))
        return paths

    def test_user_newick_tree(self, tmp_path):
        from paramugsy_tpu.cli import main as cli_main
        from paramugsy_tpu.formats.maf import read_maf
        from paramugsy_tpu.tools.mafvalidate import find_faults

        paths = self._fastas(tmp_path)
        tree = tmp_path / "tree.nwk"
        tree.write_text("((ga,gc),gb);\n")
        out = str(tmp_path / "out.maf")
        rc = cli_main(
            ["align", *paths, "-out_maf", out, "-sequential",
             "-tree", str(tree)]
        )
        assert rc == 0
        assert find_faults(list(read_maf(out))) == []

    def test_tree_mismatch_rejected(self, tmp_path):
        import pytest

        from paramugsy_tpu.pipeline import Aligner, PipelineConfig, load_genome

        paths = self._fastas(tmp_path)
        genomes = [load_genome(p) for p in paths]
        cfg = PipelineConfig(guide_tree_newick="((ga,zz),gb);")
        with pytest.raises(ValueError, match="mismatch"):
            Aligner(genomes, cfg).guide_tree()

    def test_sge_alias_single_process(self, tmp_path, capsys):
        from paramugsy_tpu.cli import main as cli_main

        paths = self._fastas(tmp_path)
        out = str(tmp_path / "out.maf")
        rc = cli_main(
            ["sge", *paths, "-out_maf", out,
             "-template_file", "/dev/null", "-exec_q", "all.q",
             "-tmp_dir", str(tmp_path / "store")]
        )
        assert rc == 0
        err = capsys.readouterr().err
        assert "superseded" in err


class TestFilterColinearEquivalence:
    def test_matches_bruteforce_on_random_instances(self):
        """The O(n log n) Fenwick-sweep LIS equals the O(n^2) DP optimum
        (same total kept ref length) on random entry sets."""
        from paramugsy_tpu.ops.align_pair import filter_colinear

        def brute(entries):
            best_total = 0
            for want_forward in (True, False):
                cand = [
                    e for e in entries
                    if e.query_range.is_forward == want_forward
                ]
                cand.sort(key=lambda e: e.ref_range.abs().start)
                n = len(cand)
                score = [0] * n
                for i in range(n):
                    score[i] = cand[i].ref_range.length
                    for j in range(i):
                        okq = (
                            cand[j].query_range.abs().end
                            < cand[i].query_range.abs().start
                            if want_forward
                            else cand[i].query_range.abs().end
                            < cand[j].query_range.abs().start
                        )
                        if (
                            cand[j].ref_range.abs().end
                            < cand[i].ref_range.abs().start
                            and okq
                        ):
                            score[i] = max(
                                score[i],
                                score[j] + cand[i].ref_range.length,
                            )
                if n:
                    best_total = max(best_total, max(score))
            return best_total

        rng = np.random.default_rng(5)
        for trial in range(25):
            entries = []
            for _ in range(int(rng.integers(1, 40))):
                rs = int(rng.integers(1, 3000))
                re_ = rs + int(rng.integers(5, 400))
                qs = int(rng.integers(1, 3000))
                qe = qs + int(rng.integers(5, 400))
                if rng.random() < 0.4:
                    qs, qe = qe, qs
                entries.append(
                    DeltaEntry("r", "q", 5000, 5000, Range(rs, re_),
                               Range(qs, qe), [], [])
                )
            got = sum(e.ref_range.length for e in filter_colinear(entries))
            want = brute(entries)
            assert got == want, (trial, got, want)
