"""Generate the committed realistic bacterial-like quality fixture.

VERDICT r3 #8: quality numbers were judged only on i.i.d.-SNP synthetics.
This set has the structural features real bacterial pan-genomes have, with
CURATED expected properties asserted in tests/test_quality_fixture.py and
reported by bench.py's quality mini-run:

* one 150 kb chromosome ancestor, 4 descendant genomes at ~1% SNP
  divergence with small indels;
* an operon-scale dispersed repeat family (6 copies of a 4 kb element at
  ~96% identity) — hostile to unique-k-mer seeding;
* IS-element-like mobile insertions (1.2 kb), present at DIFFERENT sites
  per genome (accessory content);
* a 25 kb plasmid carried by genomes 0-2 only (g3 lacks it);
* one 12 kb chromosomal inversion private to genome 2.

Deterministic (seeded): re-running reproduces the committed FASTAs
byte-for-byte.  Run from the repo root:

    python tests/data/make_realistic.py
"""
import os

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "realistic")
BASES = np.array(list("ACGT"))

CHROM_LEN = 150_000
PLASMID_LEN = 25_000
REPEAT_LEN = 4_000
REPEAT_COPIES = 6
IS_LEN = 1_200
INV_START, INV_LEN = 90_000, 12_000
SNP_RATE = 0.01


def _mutate(rng, g, rate):
    g = g.copy()
    m = rng.random(len(g)) < rate
    g[m] = (g[m] + rng.integers(1, 4, int(m.sum()))) % 4
    return g


def build():
    rng = np.random.default_rng(20260820)
    anc = rng.integers(0, 4, CHROM_LEN).astype(np.int8)
    # Operon-scale repeat family in the ancestor: 6 dispersed copies at
    # ~96% identity (placed away from the inversion span).
    element = rng.integers(0, 4, REPEAT_LEN).astype(np.int8)
    sites = [8_000, 28_000, 52_000, 70_000, 118_000, 139_000]
    for s in sites:
        anc[s : s + REPEAT_LEN] = _mutate(rng, element, 0.04)
    plasmid = rng.integers(0, 4, PLASMID_LEN).astype(np.int8)
    is_element = rng.integers(0, 4, IS_LEN).astype(np.int8)

    genomes = []
    for i in range(4):
        g = _mutate(rng, anc, SNP_RATE)
        # small indels
        g = np.delete(g, rng.choice(len(g), 12, replace=False))
        ins_at = int(rng.integers(0, len(g)))
        g = np.insert(g, ins_at, rng.integers(0, 4, 8).astype(np.int8))
        # private IS insertion site per genome (two for g1)
        is_sites = {0: [40_000], 1: [22_000, 101_000], 2: [64_000], 3: [130_000]}[i]
        for s in sorted(is_sites, reverse=True):
            g = np.insert(g, s, _mutate(rng, is_element, 0.01))
        if i == 2:  # private inversion
            a, b = INV_START, INV_START + INV_LEN
            g[a:b] = (3 - g[a:b])[::-1]
        seqs = {f"g{i}.chr": g}
        if i < 3:
            seqs[f"g{i}.plasmid"] = _mutate(rng, plasmid, SNP_RATE)
        genomes.append(seqs)
    return genomes


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for i, seqs in enumerate(build()):
        path = os.path.join(OUT_DIR, f"g{i}.fa")
        with open(path, "w") as f:
            for name, codes in seqs.items():
                text = "".join(BASES[codes])
                f.write(f">{name}\n")
                for j in range(0, len(text), 80):
                    f.write(text[j : j + 80] + "\n")
        print("wrote", path)


if __name__ == "__main__":
    main()
