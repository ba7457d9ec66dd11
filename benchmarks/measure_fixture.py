"""One-off: measure curated properties of the realistic fixture (to set
test_quality_fixture expectations after regenerating the fixture)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

from paramugsy_tpu.pipeline import Aligner, PipelineConfig, finalize_blocks, load_genome
from paramugsy_tpu.tools.mafstat import compute_stats
from paramugsy_tpu.tools.mafvalidate import find_faults

DATA = "/root/repo/tests/data/realistic"
genomes = [load_genome(os.path.join(DATA, f"g{i}.fa")) for i in range(5)]
for g in genomes:
    print(g.name, {k: len(v) for k, v in g.seqs.items()})
t0 = time.perf_counter()
blocks = finalize_blocks(Aligner(genomes, PipelineConfig()).run())
print(f"wall {time.perf_counter()-t0:.1f}s blocks={len(blocks)}")
st = compute_stats(blocks)
faults = find_faults(blocks)
print(f"core_bp={st.core_bp} sp_identity={st.sp_identity:.4f} faults={len(faults)}")
for f in faults[:5]:
    print("  fault:", f)

# plasmid 3-way columns
three_way = 0
for b in blocks:
    names = {s.name for s in b.seqs}
    plas = {n for n in names if "plasmid" in n}
    if plas and names == plas and len(plas) == 3:
        three_way += len(b.seqs[0].text)
print("plasmid 3-way cols:", three_way)

# inversion
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
print("inversion rev bp:", rev_bp)

# prophage: g1-only blocks bp
g1_only = 0
for b in blocks:
    names = {s.name for s in b.seqs}
    if all(n.startswith("g1.") and "chr" in n for n in names):
        g1_only += sum(s.size for s in b.seqs if "chr" in s.name)
print("g1-private chromosome bp:", g1_only)

# translocation: block with g3 displaced >50kb vs g0, size>2kb, all-5
disp = []
for b in blocks:
    rows = {s.name.split(".")[0]: s for s in b.seqs if "chr" in s.name}
    if "g0" in rows and "g3" in rows and len(rows) == 5:
        d = abs(rows["g3"].start - rows["g0"].start)
        if d > 50_000 and rows["g3"].size > 2_000:
            disp.append((d, rows["g3"].size, rows["g3"].start))
print("translocated 5-way blocks:", disp)
print("sizes of multi blocks:", sorted((len(b.seqs[0].text) for b in blocks if len(b.seqs) >= 2), reverse=True)[:12])
