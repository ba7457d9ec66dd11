"""Curated-property quality oracle on the realistic bacterial-like set.

The fixture (tests/data/realistic/, generated deterministically by
tests/data/make_realistic.py) carries known structure: a dispersed 4 kb
repeat family, private IS-element insertions, a plasmid absent from g3,
and a 12 kb inversion private to g2.  These tests assert the multiple
alignment recovers that structure — quality grounded on realistic input
instead of i.i.d.-SNP synthetics (VERDICT r3 #8; the reference's own
oracles are lib/mafstat/p_core.ml:71-89 and lib/mafvalidate/main.ml:20-37).
"""
import os

import pytest

DATA = os.path.join(os.path.dirname(__file__), "data", "realistic")


@pytest.fixture(scope="module")
def blocks():
    from paramugsy_tpu.pipeline import Aligner, PipelineConfig, finalize_blocks, load_genome

    genomes = [load_genome(os.path.join(DATA, f"g{i}.fa")) for i in range(4)]
    aligner = Aligner(genomes, PipelineConfig())
    return finalize_blocks(aligner.run())


def test_no_coverage_faults(blocks):
    from paramugsy_tpu.tools.mafvalidate import find_faults

    assert not find_faults(blocks)


def test_core_genome_size(blocks):
    """Core (all-4-genome) columns must cover essentially the whole
    chromosome: the 150 kb ancestor (repeat family included — it is
    ancestral, hence core) plus the shared IS element, which is
    homologous across genomes at different loci (a rearranged LCB) and
    legitimately aligns 4-way (~1.2 kb more)."""
    from paramugsy_tpu.tools.mafstat import compute_stats

    st = compute_stats(blocks)
    # Measured 151,053 on this fixture (2026-08-20) after margin-trim
    # selection (lcb.merge._trim_to_fit); was 86,843 when 1-2 bp end
    # overlaps discarded whole 24-46 kb spans.  Ceiling: shortest
    # chromosome is 151,196 bp.
    assert 140_000 <= st.core_bp <= 151_196, st.core_bp
    assert st.sp_identity > 0.95


def test_plasmid_is_accessory(blocks):
    """The plasmid rides g0-g2 only: any block containing a plasmid row
    must never contain a g3 row, and the three plasmids must co-align
    substantially (>15 kb of 3-way plasmid columns)."""
    three_way = 0
    for b in blocks:
        names = {s.name for s in b.seqs}
        plasmids = {n for n in names if "plasmid" in n}
        if not plasmids:
            continue
        assert not any(n.startswith("g3.") for n in names), names
        # plasmid rows only align to plasmid rows (no chromosome mixing)
        assert names == plasmids, names
        if len(plasmids) == 3:
            three_way += len(b.seqs[0].text)
    assert three_way > 15_000, three_way


def test_inversion_recovered(blocks):
    """g2's private 12 kb inversion: g2.chr rows appear reverse-strand
    against the others somewhere in the inversion span."""
    from paramugsy_tpu.coords.range import REVERSE

    rev_bp = 0
    for b in blocks:
        if len(b.seqs) < 2:
            continue
        strands = {s.name.split(".")[0]: s.strand for s in b.seqs if "chr" in s.name}
        if strands.get("g2") == REVERSE or (
            "g2" in strands and len(set(strands.values())) > 1
        ):
            for s in b.seqs:
                if s.name == "g2.g2_chr":
                    rev_bp += s.size
    assert rev_bp > 8_000, rev_bp


def test_fixture_is_reproducible(tmp_path):
    """The committed FASTAs are exactly what the generator produces."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "make_realistic", os.path.join(os.path.dirname(DATA), "make_realistic.py")
    )
    mod = importlib.util.module_from_spec(spec)
    mod.OUT_DIR = str(tmp_path)
    sys.modules["make_realistic"] = mod
    spec.loader.exec_module(mod)
    mod.OUT_DIR = str(tmp_path)
    mod.main()
    for i in range(4):
        want = open(os.path.join(DATA, f"g{i}.fa")).read()
        got = open(os.path.join(str(tmp_path), f"g{i}.fa")).read()
        assert got == want, f"g{i}.fa drifted from its generator"
