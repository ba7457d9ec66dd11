"""Tests for the Pallas banded wavefront DP (interpret mode on CPU)."""
import numpy as np
import pytest

from paramugsy_tpu.ops.extend import Scoring
from paramugsy_tpu.ops.pallas_extend import banded_align


def brute_nw(a, b, sc=Scoring()):
    n, m = len(a), len(b)
    dp = np.zeros((n + 1, m + 1), dtype=np.int64)
    dp[0, :] = np.arange(m + 1) * sc.gap
    dp[:, 0] = np.arange(n + 1) * sc.gap
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = sc.match if a[i - 1] == b[j - 1] else sc.mismatch
            dp[i, j] = max(
                dp[i - 1, j - 1] + s, dp[i - 1, j] + sc.gap, dp[i, j - 1] + sc.gap
            )
    return dp[n, m]


def path_score(a, b, rg, qg, n, sc=Scoring()):
    rgm = np.zeros(n, bool)
    qgm = np.zeros(n, bool)
    for g in rg:
        rgm[g.start - 1 : g.end] = True
    for g in qg:
        qgm[g.start - 1 : g.end] = True
    ri = qi = score = 0
    for c in range(n):
        if rgm[c] or qgm[c]:
            score += sc.gap
            ri += 0 if rgm[c] else 1
            qi += 0 if qgm[c] else 1
        else:
            score += sc.match if a[ri] == b[qi] else sc.mismatch
            ri += 1
            qi += 1
    assert ri == len(a) and qi == len(b), "path does not consume both sequences"
    return score


class TestBandedDP:
    @pytest.mark.parametrize("seed", range(3))
    def test_optimal_when_band_covers(self, seed):
        """When the band covers the whole DP table, banded == full optimum."""
        rng = np.random.default_rng(seed)
        la = int(rng.integers(5, 120))
        lb = max(la + int(rng.integers(-40, 40)), 2)
        a = rng.integers(0, 4, size=la).astype(np.int8)
        if seed % 2 == 0 and lb <= la:
            b = a[:lb].copy()
            m = rng.random(lb) < 0.1
            b[m] = ((b[m] + 1) % 4).astype(np.int8)
        else:
            b = rng.integers(0, 4, size=lb).astype(np.int8)
        rg, qg, n = banded_align(a, b, width=256, chunk=128, interpret=True)
        assert path_score(a, b, rg, qg, n) == brute_nw(a, b)

    def test_long_similar_pair(self):
        """A long diverged pair stays in-band and aligns near-perfectly."""
        rng = np.random.default_rng(99)
        la = 250
        a = rng.integers(0, 4, size=la).astype(np.int8)
        b = np.delete(a, [100, 101, 102])  # 3bp deletion
        m = rng.random(len(b)) < 0.02
        b[m] = ((b[m] + 1) % 4).astype(np.int8)
        rg, qg, n = banded_align(a, b, width=256, chunk=128, interpret=True)
        # one query-side gap of 3, no ref gaps
        assert sum(g.length for g in qg) == 3
        assert rg == []
        assert n == la

    def test_band_violation_raises(self):
        a = np.zeros(1000, np.int8)
        b = np.zeros(10, np.int8)
        with pytest.raises(ValueError):
            banded_align(a, b, width=256, interpret=True)

    def test_empty_query(self):
        a = np.array([0, 1, 2], np.int8)
        b = np.zeros(0, np.int8)
        rg, qg, n = banded_align(a, b, width=256, chunk=128, interpret=True)
        assert n == 3 and qg[0].length == 3 and rg == []


class TestBatchedKernel:
    def test_batch_matches_single(self):
        rng = np.random.default_rng(3)
        pairs = []
        for _ in range(5):
            la = int(rng.integers(40, 200))
            a = rng.integers(0, 4, size=la).astype(np.int8)
            b = np.delete(a, rng.choice(la, 3, replace=False)).copy()
            m = rng.random(len(b)) < 0.05
            b[m] = ((b[m] + 1) % 4).astype(np.int8)
            pairs.append((a, b))
        from paramugsy_tpu.ops.pallas_extend import banded_align_batch

        batch = banded_align_batch(pairs, width=256, chunk=128, interpret=True)
        for (a, b), got in zip(pairs, batch):
            single = banded_align(a, b, width=256, chunk=128, interpret=True)
            assert got == single


class TestWavefrontKernel:
    @pytest.mark.parametrize("seed", range(4))
    def test_optimal_when_band_covers(self, seed):
        from paramugsy_tpu.ops.pallas_extend import wavefront_align_batch

        rng = np.random.default_rng(seed)
        la = int(rng.integers(5, 120))
        lb = max(la + int(rng.integers(-40, 40)), 2)
        a = rng.integers(0, 4, size=la).astype(np.int8)
        if seed % 2 == 0 and lb <= la:
            b = a[:lb].copy()
            m = rng.random(lb) < 0.1
            b[m] = ((b[m] + 1) % 4).astype(np.int8)
        else:
            b = rng.integers(0, 4, size=lb).astype(np.int8)
        (res,) = wavefront_align_batch([(a, b)], width=256, chunk=16, interpret=True)
        rg, qg, n = res
        assert path_score(a, b, rg, qg, n) == brute_nw(a, b)

    def test_matches_row_kernel_on_batch(self):
        from paramugsy_tpu.ops.pallas_extend import (
            banded_align_batch,
            wavefront_align_batch,
        )

        rng = np.random.default_rng(11)
        pairs = []
        for _ in range(6):
            la = int(rng.integers(40, 300))
            a = rng.integers(0, 4, size=la).astype(np.int8)
            b = np.delete(a, rng.choice(la, 4, replace=False)).copy()
            m = rng.random(len(b)) < 0.05
            b[m] = ((b[m] + 1) % 4).astype(np.int8)
            pairs.append((a, b))
        wf = wavefront_align_batch(pairs, width=256, chunk=16, interpret=True)
        row = banded_align_batch(pairs, width=256, chunk=128, interpret=True)
        for (a, b), got_wf, got_row in zip(pairs, wf, row):
            # Same optimal score (tie paths may differ between formulations).
            s_wf = path_score(a, b, *got_wf)
            s_row = path_score(a, b, *got_row)
            assert s_wf == s_row == brute_nw(a, b)

    def test_empty_query(self):
        from paramugsy_tpu.ops.pallas_extend import wavefront_align_batch

        a = np.array([0, 1, 2], np.int8)
        b = np.zeros(0, np.int8)
        (res,) = wavefront_align_batch([(a, b)], width=256, chunk=16, interpret=True)
        rg, qg, n = res
        assert n == 3 and qg[0].length == 3 and rg == []

    def test_align_many_buckets_and_order(self):
        """wavefront_align_many returns per-pair optima in input order,
        across step buckets and batch padding."""
        from paramugsy_tpu.ops.pallas_extend import (
            wavefront_align_batch,
            wavefront_align_many,
        )

        rng = np.random.default_rng(21)
        segs = []
        for la in (0, 7, 30, 90, 60, 15):
            a = rng.integers(0, 4, size=la).astype(np.int8)
            if la >= 4:
                b = np.delete(a, rng.choice(la, 2, replace=False)).copy()
            else:
                b = a.copy()
            segs.append((a, b))
        many = wavefront_align_many(
            segs, batch=8, chunk=16, base_width=256, interpret=True
        )
        assert len(many) == len(segs)
        assert many[0] == ([], [], 0)
        for (a, b), got in zip(segs[1:], many[1:]):
            (single,) = wavefront_align_batch(
                [(a, b)], width=256, chunk=16, interpret=True
            )
            assert path_score(a, b, *got) == path_score(a, b, *single)

    def test_align_many_mid_size_part(self):
        """Dispatch groups of 9..batch//2 pairs round the launch batch UP
        to a multiple of 8 (regression: a fixed n_b=8 indexed out of
        bounds for e.g. 12 pairs with batch=64, ADVICE r2)."""
        from paramugsy_tpu.ops.pallas_extend import wavefront_align_many

        rng = np.random.default_rng(33)
        segs = []
        for _ in range(12):
            la = int(rng.integers(10, 60))
            a = rng.integers(0, 4, size=la).astype(np.int8)
            b = np.delete(a, rng.choice(la, 2, replace=False)).copy()
            segs.append((a, b))
        many = wavefront_align_many(
            segs, batch=64, chunk=16, base_width=256, interpret=True
        )
        assert len(many) == 12
        for (a, b), got in zip(segs, many):
            assert path_score(a, b, *got) == brute_nw(a, b)

    def test_device_tb_bitmap_path_interpret(self):
        """A pair long enough to enable the bitmap-jump traceback
        (steps16 % 256 == 0) must reproduce the host traceback exactly —
        the tiny cases above all run the word-at-a-time fallback, so
        without this the jump arithmetic is only exercised on hardware
        (where bench_device_dp asserts equality every round)."""
        from paramugsy_tpu.ops.pallas_extend import (
            _device_stream_inputs,
            _expand_streams,
            _runs_of_path_words,
            traceback_wavefront,
            wavefront_dp,
            wavefront_dp_device_tb,
        )
        import jax.numpy as jnp

        rng = np.random.default_rng(8)
        la = 2000
        a = rng.integers(0, 4, size=la).astype(np.int8)
        b = np.delete(a, rng.choice(la, 6, replace=False)).copy()
        m = rng.random(len(b)) < 0.02
        b[m] = ((b[m] + 1) % 4).astype(np.int8)
        pairs = [(a, b)] * 8
        bucket = 4096  # >= la + lb steps; steps16 = 256 enables the bitmap
        assert (bucket // 16) % 256 == 0 and bucket >= la + len(b)
        A8, B8, Aw, Bw = _device_stream_inputs(pairs, bucket, 8, 256)
        args = _expand_streams(
            *map(jnp.asarray, (A8, B8, Aw, Bw)), steps=bucket, width=256
        )
        lens = jnp.asarray(np.array([(len(a), len(b))] * 8, np.int32))
        buf = np.asarray(
            wavefront_dp_device_tb(
                *args, lens, width=256, chunk=128, batch=8, interpret=True
            )
        )
        dirs = np.asarray(
            wavefront_dp(*args, width=256, chunk=128, batch=8, interpret=True)
        )
        want = traceback_wavefront(dirs[:, 0, :], la, len(b), 256)
        got = _runs_of_path_words(buf[0, 1:], int(buf[0, 0]))
        assert got == want
