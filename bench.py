"""Benchmark harness: pairwise whole-genome alignment throughput on one chip.

Prints the headline JSON line
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}
IMMEDIATELY after the headline measurement (so a timeout mid-extras still
records the round), then runs strictly time-budgeted extras (quality
mini-run, device-DP smoke, repeat-rich pair) and prints one final enriched
JSON line — a superset with the same metric/value.  Whichever line is last
on stdout parses to the same headline number.

Budget: PARAMUGSY_BENCH_BUDGET seconds (default 480; round 3 measured the
driver tolerating >= 263 s, and the warm-cache first dispatch is ~2 s).
Every extra checks the remaining budget before starting; none of them can
delay the headline print.  All jit shapes the bench touches are
pre-compilable with ``python benchmarks/warm_cache.py`` (the persistent
compilation cache makes later runs load in seconds).  Under the round-4
sampled seeding defaults the repeat-rich pair fits the DEFAULT 4096-run
bucket (measured 1038 merged runs), so no pinned bucket and no retry
ladder exist anywhere in the bench.

Config: a synthetic bacterial-scale genome pair (ref + 1%-diverged query
with indels and an inversion), aligned end-to-end (device seeding &
clustering + chaining + extension) after a warm-up run that absorbs
compilation-cache loads.

Baselines (see benchmarks/BENCH_NOTES.md "Baseline provenance"):
* ``vs_baseline`` compares against a MEASURED single-core host-CPU run of
  this same pipeline on this same pair (taskset -c 0, JAX_PLATFORMS=cpu,
  PARAMUGSY_DEVICE_DP=0): 1.49 Mbp/s on this machine, 2026-08-21.
  That is the strongest host baseline available in this
  environment (all-cores matches it — 2-core machine, XLA sort-bound).
* The reference's own aligner is external MUMmer ``nucmer`` (not present
  here, no egress to fetch it); literature timings for bacterial-scale
  pairs put it at ~0.1-0.5 Mbp/s single-core — reported separately in
  ``detail.vs_nucmer_class_estimate`` and clearly labeled an estimate.

The enriched ``detail`` adds:
* ``quality``: blocks / core bp / SP identity / coverage faults from a
  4-genome multiple alignment sharing the headline's compiled shapes —
  the reference's own oracles (lib/mafstat/p_core.ml:71-89,
  lib/mafvalidate/main.ml:20-37), so quality regressions land in
  BENCH_rN.json alongside speed;
* ``device_dp_gcells_per_s``: the Pallas wavefront engine smoke (64 x
  8 kbp banded alignments, on-device traceback) with a hard equality
  assert against the host C++ engine;
* ``repeat_rich_mbp_per_s``: hostile-input (dispersed repeat family)
  throughput with the pinned seed bucket.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

T_START = time.monotonic()
BUDGET_S = float(os.environ.get("PARAMUGSY_BENCH_BUDGET", "480"))

# Measured on this machine (2026-08-21, commit b39e482, benchmarks/
# baseline_host.py; RAW LOG checked in at benchmarks/baseline_host_log.txt
# so the measurement is auditable): same pipeline, one CPU core
# (taskset -c 0, JAX_PLATFORMS=cpu, PARAMUGSY_DEVICE_DP=0), same pair,
# best of 3 after warm-up, with the platform-adaptive compaction keeping
# the CPU path on its fastest (scatter) form.  Sampled seeding (the
# default) is also the fastest host config (exact seeding: 0.4 Mbp/s);
# all-cores is identical (2-core machine, XLA sort-bound), so this is
# the strongest host number available here.  Supersedes the 5.4 recorded
# 2026-08-19 (not reproducible under strict 1-core pinning on any
# config); the ratio against that retracted number is still reported as
# ``vs_superseded_5p4_baseline`` so both denominators stay visible.
BASELINE_HOST_1CORE_MBP_PER_S = 1.51
SUPERSEDED_BASELINE_MBP_PER_S = 5.4
# Literature-derived nucmer-class estimate (NOT measured here): MUMmer-
# family aligners run bacterial pairs in tens of seconds single-core.
NUCMER_CLASS_MBP_PER_S_ESTIMATE = 0.3
GENOME_MBP = 2.0


def remaining() -> float:
    return BUDGET_S - (time.monotonic() - T_START)


def build_pair(rng, n):
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    q = ref.copy()
    subs = rng.random(n) < 0.01
    q[subs] = ((q[subs] + rng.integers(1, 4, size=int(subs.sum()))) % 4).astype(np.int8)
    # a few indels + one inversion, applied in numpy code space
    q = np.concatenate([q[: n // 3], q[n // 3 + 12 :]])
    ins = rng.integers(0, 4, size=9).astype(np.int8)
    q = np.concatenate([q[: n // 2], ins, q[n // 2 :]])
    a, b = 2 * n // 3, 2 * n // 3 + 20000
    inv = (3 - q[a:b])[::-1].copy()
    q = np.concatenate([q[:a], inv, q[b:]])
    return ref, q


def build_repeat_rich_pair(rng, n, unit=4000, copies=40):
    """A pair whose ref carries a dispersed repeat family (`copies` copies
    of a `unit`-bp element at ~95% identity) — hostile input for unique-
    k-mer seeding, unlike the headline pair."""
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    element = rng.integers(0, 4, size=unit).astype(np.int8)
    sites = rng.choice(n - unit, size=copies, replace=False)
    for s in sites:
        copy = element.copy()
        m = rng.random(unit) < 0.05
        copy[m] = ((copy[m] + 1) % 4).astype(np.int8)
        ref[s : s + unit] = copy
    q = ref.copy()
    subs = rng.random(n) < 0.01
    q[subs] = ((q[subs] + rng.integers(1, 4, size=int(subs.sum()))) % 4).astype(np.int8)
    q = np.concatenate([q[: n // 2], q[n // 2 + 17 :]])
    return ref, q


def build_family(rng, n, count=4, div=0.005):
    """`count` genomes independently diverged from one ancestor — the
    quality mini-run's input (same length as the headline pair, so the
    whole multiple alignment reuses the headline's compiled shapes)."""
    from paramugsy_tpu.pipeline import Genome

    bases = np.array(list("ACGT"))
    anc = rng.integers(0, 4, size=n).astype(np.int8)
    genomes = []
    for i in range(count):
        g = anc.copy()
        subs = rng.random(n) < div
        g[subs] = ((g[subs] + rng.integers(1, 4, size=int(subs.sum()))) % 4).astype(np.int8)
        # one small indel each so coordinates differ
        g = np.delete(g, rng.integers(0, n, size=5))
        genomes.append(
            Genome(name=f"q{i}", seqs={f"q{i}.chr": "".join(bases[g])})
        )
    return genomes


def bench_align(ref, query, names, cfg, align_pair, device_cache, reps=5):
    dt = float("inf")
    entries = []
    for _ in range(reps):
        t0 = time.perf_counter()
        entries = align_pair(ref, query, *names, cfg, device_cache=device_cache)
        dt = min(dt, time.perf_counter() - t0)
    aligned = sum(e.alignment_length() for e in entries)
    return aligned / 1e6 / dt, entries, dt


def bench_device_dp(rng, n_pairs=64, length=16384, reps=2):
    """End-to-end device wavefront DP (forward + on-device traceback),
    with a hard equality check against the host C++ banded engine.

    64 x 16 kb is the engine's sustained shape (r1-r4 measured 64 x 8 kb;
    r5's bitmap-jump traceback + fused fetch + nibble-packed uploads made
    the walk event-bound, so the longer launch amortizes the fixed
    ~27 ms tunnel round trip into an honest sustained-throughput number:
    8 kb measures 4.2, 16 kb 6.1 Gcells/s on the same code)."""
    from paramugsy_tpu.ops.extend import align_long_segment
    from paramugsy_tpu.ops.pallas_extend import wavefront_align_many

    pairs = []
    for _ in range(n_pairs):
        a = rng.integers(0, 4, size=length).astype(np.int8)
        b = np.delete(a, rng.choice(length, 20, replace=False)).copy()
        m = rng.random(len(b)) < 0.02
        b[m] = ((b[m] + 1) % 4).astype(np.int8)
        pairs.append((a, b))
    res = wavefront_align_many(pairs)  # warm-up / compile
    # Regression oracle: device result == host C++ result on a sample.
    for i in (0, n_pairs // 2, n_pairs - 1):
        host = align_long_segment(pairs[i][0], pairs[i][1])
        assert res[i] == host, f"device/host DP mismatch on pair {i}"
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        res = wavefront_align_many(pairs)
        dt = min(dt, time.perf_counter() - t0)
    cells = sum(len(a) * 512 for a, _ in pairs)
    assert all(r[2] >= length for r in res)
    return cells / dt / 1e9


def bench_quality(rng, n):
    """4-genome multiple alignment -> the reference's quality oracles,
    with the per-phase wall breakdown (pairwise vs each merge stage) so a
    merge-cost regression is visible in the driver artifact, not just the
    total."""
    from paramugsy_tpu.pipeline import Aligner, PipelineConfig, finalize_blocks
    from paramugsy_tpu.tools.mafstat import compute_stats
    from paramugsy_tpu.tools.mafvalidate import find_faults
    from paramugsy_tpu.utils.obs import METRICS

    genomes = build_family(rng, n)
    cfg = PipelineConfig()
    before = {k: v.total_s for k, v in METRICS.phases.items()}
    t0 = time.perf_counter()
    aligner = Aligner(genomes, cfg)
    blocks = finalize_blocks(aligner.run())
    wall = time.perf_counter() - t0
    phases = {
        k: round(v.total_s - before.get(k, 0.0), 3)
        for k, v in sorted(METRICS.phases.items())
        if v.total_s - before.get(k, 0.0) > 0.0005
    }
    st = compute_stats(blocks)
    faults = find_faults(blocks)
    return {
        "genomes": len(genomes),
        "genome_mbp": round(n / 1e6, 3),
        "blocks": len(blocks),
        "core_bp": st.core_bp,
        "sp_identity": round(st.sp_identity, 4),
        "coverage_faults": len(faults),
        "wall_s": round(wall, 2),
        "phases_s": phases,
    }


def _watchdog_no_headline() -> None:
    # A wedged device tunnel hangs even jax.devices() (observed
    # 2026-08-20, BENCH_NOTES outage note): without this, the driver
    # records a bare rc=124 with no diagnosis.
    print(
        f"BENCH WATCHDOG: no headline after {BUDGET_S + 60:.0f}s — device "
        "init hang or compile storm; aborting (steady-state perf is NOT "
        "measurable in this environment state).",
        flush=True,
    )
    os._exit(3)


def main() -> None:
    import threading

    watchdog = threading.Timer(BUDGET_S + 60, _watchdog_no_headline)
    watchdog.daemon = True
    watchdog.start()

    import jax

    from paramugsy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from paramugsy_tpu.ops import engines
    from paramugsy_tpu.ops.align_pair import AlignConfig, align_pair

    n = int(GENOME_MBP * 1e6)
    rng = np.random.default_rng(12345)
    ref, query = build_pair(rng, n)
    cfg = AlignConfig()
    device_cache: dict = {}

    # Warm-up: compiles (or loads from the persistent cache) the device
    # kernels for this bucket shape.
    _ = align_pair(ref, query, "bench.r", "bench.q", cfg, device_cache=device_cache)

    mbp_per_s, entries, dt = bench_align(
        ref, query, ("bench.r", "bench.q"), cfg, align_pair, device_cache
    )

    detail = {
        "genome_mbp": GENOME_MBP,
        "entries": len(entries),
        "aligned_bp": sum(e.alignment_length() for e in entries),
        "wall_s": round(dt, 3),
        "backend": jax.default_backend(),
        "baseline_host_1core_mbp_per_s": BASELINE_HOST_1CORE_MBP_PER_S,
        "vs_superseded_5p4_baseline": round(
            mbp_per_s / SUPERSEDED_BASELINE_MBP_PER_S, 2
        ),
        "vs_nucmer_class_estimate": round(
            mbp_per_s / NUCMER_CLASS_MBP_PER_S_ESTIMATE, 1
        ),
        "dp_engines": dict(engines.COUNTS),
        "headline_elapsed_s": round(time.monotonic() - T_START, 1),
    }
    line = {
        "metric": "aligned_mbp_per_s_per_chip",
        "value": round(mbp_per_s, 3),
        "unit": "Mbp/s",
        "vs_baseline": round(mbp_per_s / BASELINE_HOST_1CORE_MBP_PER_S, 2),
        "detail": detail,
    }
    # THE driver line: printed before any extra can time the round out.
    print(json.dumps(line), flush=True)
    watchdog.cancel()
    # Post-headline guard: a device hang inside an extra must not turn an
    # already-recorded headline into an rc=124.  The headline line is on
    # stdout; exiting cleanly keeps it parseable — but the abort is made
    # EXPLICIT (extras_aborted in a final enriched line), not inferable
    # only from missing fields (VERDICT r4 weak #5).
    def _abort_extras():
        detail["extras_aborted"] = (
            "tail guard fired: an extra wedged after the headline "
            "(device hang mid-extra); missing detail fields are unmeasured"
        )
        print(json.dumps(line), flush=True)
        os._exit(0)

    tail_guard = threading.Timer(max(remaining(), 0) + 60, _abort_extras)
    tail_guard.daemon = True
    tail_guard.start()

    # ---- strictly budgeted extras (each skipped, never partial;
    # ordered by information value, measured cost in parens).  Engine
    # counts are recorded PER SECTION (delta of engines.COUNTS), so the
    # headline's engine mix can't be confused with an extra's (VERDICT r4
    # weak #4: the device-DP smoke's host-oracle calls looked like the
    # headline ran host-banded). ----------------------------------------
    def engines_delta(before):
        return {
            k: v - before.get(k, 0)
            for k, v in engines.COUNTS.items()
            if v - before.get(k, 0)
        }

    if remaining() > 40:  # ~7 s warm (shares the headline's shapes)
        try:
            snap = dict(engines.COUNTS)
            q = bench_quality(rng, n)
            q["dp_engines"] = engines_delta(snap)
            # Loud regression gates (r4 measured: 7 blocks, core 1999969,
            # SP 0.990, 0 faults, 2.93 s wall): a merge-cost or quality
            # regression lands as an explicit field, not a silent number.
            gates = []
            if q["wall_s"] > 6.0:
                gates.append(f"wall_s {q['wall_s']} > 6.0 (r4: 2.93)")
            if not 1 <= q["blocks"] <= 14:
                gates.append(f"blocks {q['blocks']} outside [1, 14] (r5: 1)")
            if q["core_bp"] < 1_990_000:
                gates.append(f"core_bp {q['core_bp']} < 1990000 (r4: 1999969)")
            if q["sp_identity"] < 0.985:
                gates.append(f"sp_identity {q['sp_identity']} < 0.985")
            if q["coverage_faults"]:
                gates.append(f"{q['coverage_faults']} coverage faults")
            if gates:
                q["REGRESSION"] = gates
            detail["quality"] = q
        except Exception as e:  # never lose the headline over an extra
            detail["quality_error"] = repr(e)

    if remaining() > 35:  # ~5 s warm (shares the headline's shapes)
        try:
            snap = dict(engines.COUNTS)
            rr_ref, rr_query = build_repeat_rich_pair(rng, n)
            rr_mbp_per_s, rr_entries, _ = bench_align(
                rr_ref, rr_query, ("bench.rr", "bench.rq"), cfg,
                align_pair, device_cache,
            )
            detail["repeat_rich_mbp_per_s"] = round(rr_mbp_per_s, 3)
            detail["repeat_rich_entries"] = len(rr_entries)
            detail["repeat_rich_dp_engines"] = engines_delta(snap)
        except Exception as e:
            detail["repeat_rich_error"] = repr(e)

    if jax.default_backend() == "tpu" and remaining() > 30:  # ~15 s warm
        try:
            snap = dict(engines.COUNTS)
            detail["device_dp_gcells_per_s"] = round(bench_device_dp(rng), 3)
            detail["device_dp_dp_engines"] = engines_delta(snap)
        except Exception as e:
            detail["device_dp_error"] = repr(e)

    detail["dp_engines_all_sections"] = dict(engines.COUNTS)
    detail["total_elapsed_s"] = round(time.monotonic() - T_START, 1)
    try:
        with open("benchmarks/last_bench_detail.json", "w") as f:
            json.dump(line, f, indent=1)
    except OSError:
        pass
    # Final enriched line (same metric/value): whichever line the driver's
    # tail parser sees last, the headline number is identical.
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
