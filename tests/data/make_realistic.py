"""Generate the committed realistic bacterial-like quality fixture.

VERDICT r3 #8 / r4 #4: quality numbers must be grounded on input with the
structural features real bacterial pan-genomes have, not i.i.d.-SNP
synthetics.  This set has, with CURATED expected properties asserted in
tests/test_quality_fixture.py (and a three-mode equality test in
tests/test_modes.py):

* one ~210 kb chromosome ancestor, 5 descendant genomes — four at ~1% SNP
  divergence with small indels, plus ONE 5%-divergent outlier (g4);
* an operon-scale dispersed repeat family (6 copies of a 4 kb element at
  ~96% identity) — hostile to unique-k-mer seeding;
* a TANDEM repeat array (24 x 150 bp unit at ~98% identity per copy);
* an rRNA-operon-like family: 5 dispersed copies of a 5 kb element at
  ~99.5% identity (near-identical multi-copy, the classic bacterial
  mis-assembly/mis-alignment trap);
* IS-element-like mobile insertions (1.2 kb), present at DIFFERENT sites
  per genome (accessory content);
* a 25 kb plasmid carried by genomes 0-2 only (g3/g4 lack it);
* one 12 kb chromosomal inversion private to genome 2;
* a PROPHAGE-scale private insertion: 40 kb of novel sequence in g1;
* a 10 kb TRANSLOCATION private to g3 (segment moved ~130 kb upstream).

Deterministic (seeded): re-running reproduces the committed FASTAs
byte-for-byte.  Run from the repo root:

    python tests/data/make_realistic.py
"""
import os

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "realistic")
BASES = np.array(list("ACGT"))

CHROM_LEN = 210_000
PLASMID_LEN = 25_000
REPEAT_LEN = 4_000
REPEAT_SITES = [8_000, 28_000, 52_000, 70_000, 118_000, 139_000]
TANDEM_UNIT, TANDEM_COPIES, TANDEM_AT = 150, 24, 45_000
OPERON_LEN = 5_000
OPERON_SITES = [60_000, 110_000, 155_000, 175_000, 195_000]
IS_LEN = 1_200
INV_START, INV_LEN = 90_000, 12_000
PROPHAGE_LEN, PROPHAGE_AT = 40_000, 80_000  # g1 only
TRANS_START, TRANS_LEN, TRANS_TO = 162_000, 10_000, 36_000  # g3 only
SNP_RATE = 0.01
OUTLIER_RATE = 0.05  # g4


def _mutate(rng, g, rate):
    g = g.copy()
    m = rng.random(len(g)) < rate
    g[m] = (g[m] + rng.integers(1, 4, int(m.sum()))) % 4
    return g


def build():
    rng = np.random.default_rng(20260821)
    anc = rng.integers(0, 4, CHROM_LEN).astype(np.int8)
    # Dispersed repeat family: 6 copies at ~96% identity.
    element = rng.integers(0, 4, REPEAT_LEN).astype(np.int8)
    for s in REPEAT_SITES:
        anc[s : s + REPEAT_LEN] = _mutate(rng, element, 0.04)
    # Tandem array: 24 near-identical 150 bp units back to back.
    unit = rng.integers(0, 4, TANDEM_UNIT).astype(np.int8)
    for c in range(TANDEM_COPIES):
        anc[TANDEM_AT + c * TANDEM_UNIT : TANDEM_AT + (c + 1) * TANDEM_UNIT] = (
            _mutate(rng, unit, 0.02)
        )
    # rRNA-like operon family: 5 copies at ~99.5% identity.
    operon = rng.integers(0, 4, OPERON_LEN).astype(np.int8)
    for s in OPERON_SITES:
        anc[s : s + OPERON_LEN] = _mutate(rng, operon, 0.005)
    plasmid = rng.integers(0, 4, PLASMID_LEN).astype(np.int8)
    is_element = rng.integers(0, 4, IS_LEN).astype(np.int8)
    prophage = rng.integers(0, 4, PROPHAGE_LEN).astype(np.int8)

    genomes = []
    for i in range(5):
        g = _mutate(rng, anc, OUTLIER_RATE if i == 4 else SNP_RATE)
        # small indels
        g = np.delete(g, rng.choice(len(g), 12, replace=False))
        ins_at = int(rng.integers(0, len(g)))
        g = np.insert(g, ins_at, rng.integers(0, 4, 8).astype(np.int8))
        if i == 3:  # private translocation: cut [TRANS_START, +LEN), paste
            seg = g[TRANS_START : TRANS_START + TRANS_LEN].copy()
            g = np.delete(g, np.arange(TRANS_START, TRANS_START + TRANS_LEN))
            g = np.insert(g, TRANS_TO, seg)
        if i == 2:  # private inversion
            a, b = INV_START, INV_START + INV_LEN
            g[a:b] = (3 - g[a:b])[::-1]
        if i == 1:  # private prophage insertion
            g = np.insert(g, PROPHAGE_AT, prophage)
        # private IS insertion site per genome (two for g1)
        is_sites = {
            0: [40_000], 1: [22_000, 130_000], 2: [64_000], 3: [130_000],
            4: [150_000],
        }[i]
        for s in sorted(is_sites, reverse=True):
            g = np.insert(g, s, _mutate(rng, is_element, 0.01))
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
