"""Unit tests for the coordinate algebra (ranges + profiles).

Reference-semantics cases derived from lib/profiles/m_range.ml,
lib/profiles_lib/m_profile.cc and the reference's own C++ test
(lib/profiles_lib/m_profile_test.cc).
"""
import io

import numpy as np
import pytest

from paramugsy_tpu.coords.range import FORWARD, REVERSE, Range, of_maf_v, overlap_v
from paramugsy_tpu.coords.profile import (
    Metaprofile,
    Profile,
    ProfileIdxOutOfRange,
    SeqIdxOutOfRange,
    gaps_of_text,
)


class TestRange:
    def test_direction(self):
        assert Range(3, 5).direction == FORWARD
        assert Range(5, 3).direction == REVERSE
        assert Range(6, 6).direction == FORWARD

    def test_length(self):
        assert Range(3, 5).length == 3
        assert Range(5, 3).length == 3
        assert Range(6, 6).length == 1

    def test_overlap(self):
        assert Range(1, 10).overlap(Range(5, 15)) == Range(5, 10)
        assert Range(1, 4).overlap(Range(5, 15)) is None
        assert Range(5, 5).overlap(Range(5, 5)) == Range(5, 5)
        # Direction-insensitive.
        assert Range(10, 1).overlap(Range(15, 5)) == Range(5, 10)

    def test_contains(self):
        assert Range(5, 3).contains(4)
        assert not Range(5, 3).contains(6)

    def test_of_maf_forward(self):
        # 0-indexed start 2, size 3 -> 1-indexed inclusive (3, 5)
        assert Range.of_maf(2, 3, 100, FORWARD) == Range(3, 5)

    def test_of_maf_reverse(self):
        # src_size=100, start0=2, size=3: reverse-strand start counts from
        # the 3' end, so range is (98, 96) (reference m_range.ml:60-66).
        assert Range.of_maf(2, 3, 100, REVERSE) == Range(98, 96)

    def test_maf_round_trip(self):
        for start, size, src, d in [(0, 10, 50, FORWARD), (7, 3, 50, REVERSE), (40, 10, 50, REVERSE)]:
            r = Range.of_maf(start, size, src, d)
            assert r.to_maf(src) == (start, size)

    def test_vectorized_match_scalar(self):
        rng = np.random.RandomState(0)
        s1, e1 = rng.randint(1, 100, 50), rng.randint(1, 100, 50)
        s2, e2 = rng.randint(1, 100, 50), rng.randint(1, 100, 50)
        ok, s, e = overlap_v(s1, e1, s2, e2)
        for i in range(50):
            expect = Range(s1[i], e1[i]).overlap(Range(s2[i], e2[i]))
            if expect is None:
                assert not ok[i]
            else:
                assert ok[i] and (s[i], e[i]) == (expect.start, expect.end)


class TestGapsOfText:
    def test_no_gaps(self):
        assert gaps_of_text("ACGT") == []

    def test_single(self):
        # 1-indexed: gap at positions 3-4
        assert gaps_of_text("AC--GT") == [Range(3, 4)]

    def test_edges(self):
        assert gaps_of_text("--ACGT--") == [Range(1, 2), Range(7, 8)]

    def test_all(self):
        assert gaps_of_text("----") == [Range(1, 4)]


def mk_profile(text="ACG--TA-C", start=11, reverse=False, src=100):
    # forward range over len(ungapped) bases
    n = sum(1 for c in text if c != "-")
    rng = Range(start + n - 1, start) if reverse else Range(start, start + n - 1)
    return Profile.of_maf_entry(("g", "0"), "g.chr1", rng, src, text)


class TestProfileIndexMaps:
    def test_forward_round_trip(self):
        p = mk_profile()  # seq positions 11..17 (7 bases), length 9
        assert p.length == 9
        assert p.gaps == [Range(4, 5), Range(8, 8)]
        # seq 11 (first base) -> profile 1
        assert p.profile_idx_of_seq_idx(11) == 1
        # seq 13 = 'G' (3rd) -> profile 3; seq 14 = 'T' (4th base) skips gap 4-5 -> 6
        assert p.profile_idx_of_seq_idx(13) == 3
        assert p.profile_idx_of_seq_idx(14) == 6
        assert p.profile_idx_of_seq_idx(16) == 9  # 'C' last, skips both gaps
        # inverse
        assert p.seq_idx_of_profile_idx(1) == 11
        assert p.seq_idx_of_profile_idx(3) == 13
        assert p.seq_idx_of_profile_idx(4) is None
        assert p.seq_idx_of_profile_idx(5) is None
        assert p.seq_idx_of_profile_idx(6) == 14
        assert p.seq_idx_of_profile_idx(9) == 16

    def test_reverse_round_trip(self):
        p = mk_profile(reverse=True)  # 6 ungapped bases -> range (16, 11)
        assert p.profile_idx_of_seq_idx(16) == 1
        assert p.profile_idx_of_seq_idx(14) == 3
        assert p.seq_idx_of_profile_idx(1) == 16
        assert p.seq_idx_of_profile_idx(6) == 13
        assert p.seq_idx_of_profile_idx(4) is None

    def test_out_of_range(self):
        p = mk_profile()
        with pytest.raises(SeqIdxOutOfRange):
            p.profile_idx_of_seq_idx(10)
        with pytest.raises(ProfileIdxOutOfRange):
            p.seq_idx_of_profile_idx(10)

    def test_batch_matches_scalar(self):
        rng = np.random.RandomState(1)
        text = "".join(rng.choice(list("ACGT-"), 200, p=[0.22, 0.22, 0.22, 0.22, 0.12]))
        if text[0] == "-":
            text = "A" + text[1:]
        if text[-1] == "-":
            text = text[:-1] + "A"
        for reverse in (False, True):
            p = mk_profile(text=text, start=1000, reverse=reverse, src=5000)
            sis = np.arange(p.range.abs().start, p.range.abs().end + 1)
            got = p.profile_idx_of_seq_idx_v(sis)
            want = np.array([p.profile_idx_of_seq_idx(int(s)) for s in sis])
            np.testing.assert_array_equal(got, want)
            pis = np.arange(1, p.length + 1)
            ok, si = p.seq_idx_of_profile_idx_v(pis)
            for i, pi in enumerate(pis):
                w = p.seq_idx_of_profile_idx(int(pi))
                if w is None:
                    assert not ok[i]
                else:
                    assert ok[i] and si[i] == w

    def test_round_trip_property(self):
        p = mk_profile(text="AC--GTAC-GT--A", start=50)
        for si in range(p.range.abs().start, p.range.abs().end + 1):
            pi = p.profile_idx_of_seq_idx(si)
            assert p.seq_idx_of_profile_idx(pi) == si


class TestSubset:
    def test_simple(self):
        p = mk_profile()  # "ACG--TA-C", seq 11..17
        sub = p.subset_profile(2, 7)  # "CG--TA" -> seq 12..15
        assert sub is not None
        assert sub.range == Range(12, 15)
        # Quirk: gaps stay in parent coords.
        assert sub.gaps == [Range(4, 5)]
        assert sub.length == 4 + 2
        assert sub.text == "CG--TA"

    def test_all_gap_returns_none(self):
        p = mk_profile()
        assert p.subset_profile(4, 5) is None

    def test_leading_trailing_gap_adjustment(self):
        p = mk_profile()  # gaps (4,5) and (8,8)
        sub = p.subset_profile(4, 8)  # "--TA-" -> starts at seq of 6, ends at seq of 7
        assert sub is not None
        assert sub.range == Range(14, 15)
        assert sub.gaps == [Range(4, 5), Range(8, 8)]

    def test_swapped(self):
        p = mk_profile()
        assert p.subset_profile(7, 2) == p.subset_profile(2, 7)

    def test_subset_seq(self):
        p = mk_profile()
        sub = p.subset_seq(12, 15)
        assert sub.range == Range(12, 15)


class TestReverse:
    def test_reverse(self):
        p = mk_profile()  # "ACG--TA-C" len 9, gaps (4,5),(8,8)
        r = p.reverse()
        assert r.range == Range(16, 11)
        assert r.text == "C-AT--GCA"
        assert r.gaps == [Range(2, 2), Range(5, 6)]
        assert r.reverse().gaps == p.gaps
        assert r.reverse().text == p.text

    def test_reverse_index_consistency(self):
        p = mk_profile()
        r = p.reverse()
        # position mapping mirrors: profile idx i in p <-> len-i+1 in r
        for pi in range(1, p.length + 1):
            a, b = p.seq_idx_of_profile_idx(pi), r.seq_idx_of_profile_idx(p.length - pi + 1)
            assert a == b


class TestMetaprofile:
    def test_identity(self):
        p = mk_profile()
        m = Metaprofile(p)
        assert m.profile_idx_of_profile_idx(3) == 3

    def test_reversed(self):
        p = mk_profile()
        m = Metaprofile(p, True)
        assert m.profile_idx_of_profile_idx(1) == 9
        assert m.profile_idx_of_profile_idx(9) == 1
        assert m.reverse().profile_idx_of_profile_idx(5) == 5


class TestProfileIO:
    def test_round_trip(self):
        p = mk_profile()
        buf = io.StringIO()
        p.write(buf)
        buf.seek(0)
        q = Profile.read(buf)
        assert q is not None
        assert (q.name, q.seq_name, q.range, q.length, q.gaps, q.src_size, q.text) == (
            p.name, p.seq_name, p.range, p.length, p.gaps, p.src_size, p.text)

    def test_lite(self):
        p = mk_profile()
        buf = io.StringIO()
        p.write(buf)
        p.write(buf)
        buf.seek(0)
        q1 = Profile.read(buf, lite=True)
        q2 = Profile.read(buf, lite=True)
        assert q1.text == "" and q2 is not None
        assert Profile.read(buf) is None
