"""BASELINE config 1: MAF defrag/stitch pipeline on the repo fixture.

CPU-runnable.  Reports wall-clock and verifies the expected stitch result
(the two all-genome-adjacent blocks merge; everything else unchanged).
"""
import json
import sys
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import time

from paramugsy_tpu.formats.maf import read_maf
from paramugsy_tpu.tools.stitch import stitch_blocks

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "highly_stitchable.maf",
)


def main():
    blocks = list(read_maf(FIXTURE))
    # Amplify the fixture for a measurable workload.
    reps = 2000
    big = []
    for r in range(reps):
        for b in blocks:
            nb = type(b)(
                seqs=[
                    type(s)(f"{s.name}{r}", s.start, s.size, s.strand, s.src_size, s.text)
                    for s in b.seqs
                ],
                score=b.score,
                attrs=dict(b.attrs),
            )
            big.append(nb)
    t0 = time.perf_counter()
    out = stitch_blocks(big)
    dt = time.perf_counter() - t0
    assert len(out) == reps * (len(blocks) - 1), "unexpected stitch result"
    print(json.dumps({
        "metric": "stitch_blocks_per_s",
        "value": round(len(big) / dt, 1),
        "unit": "blocks/s",
        "detail": {"blocks_in": len(big), "blocks_out": len(out), "wall_s": round(dt, 4)},
    }))


if __name__ == "__main__":
    main()
