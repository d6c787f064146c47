"""Golden-model tests: the scalar Python coder is the executable spec.

Covers the reference's acceptance test (examples/sample_impl.rs:72-128),
property-based round trips over random/skewed/degenerate corpora
(SURVEY.md §4), error paths, and byte-for-byte conformance between the
Python and C++ golden models.
"""

import numpy as np
import pytest

from range_coder_rust_tpu import Decoder, Encoder, FreqTable, RangeCoder, errors
from range_coder_rust_tpu.native import golden

EXAMPLE_DATA = [2, 1, 1, 4, 1, 4, 2, 1, 0, 1, 5, 9, 8, 7, 6, 5]


def roundtrip_scalar(syms, alphabet):
    ft = FreqTable.from_data(np.asarray(syms), alphabet)
    enc = Encoder()
    for s in syms:
        enc.encode(ft, int(s))
    code = enc.finish()
    dec = Decoder(code)
    out = [dec.decode(ft) for _ in syms]
    return code, out, ft


class TestReferenceExample:
    def test_roundtrip(self):
        code, out, ft = roundtrip_scalar(EXAMPLE_DATA, 10)
        assert out == EXAMPLE_DATA

    def test_table_matches_reference_printout(self):
        # expected c/cum values from running the reference example
        ft = FreqTable.from_data(np.array(EXAMPLE_DATA), 10)
        expect_c = [1, 5, 2, 0, 2, 2, 1, 1, 1, 1]
        expect_cum = [0, 1, 6, 8, 8, 10, 12, 13, 14, 15]
        assert [ft.c_freq(i) for i in range(10)] == expect_c
        assert [ft.cum_freq(i) for i in range(10)] == expect_cum
        assert ft.total_freq() == 16

    def test_flush_is_8_bytes_and_min_length(self):
        enc = Encoder()
        code = enc.finish()  # empty input still flushes 8 bytes
        assert len(code) == 8


class TestRangeCoderCore:
    def test_initial_state(self):
        rc = RangeCoder()
        assert rc.lower_bound == 0
        assert rc.range == (1 << 64) - 1
        assert rc.upper_bound() == (1 << 64) - 1

    def test_range_par_total(self):
        rc = RangeCoder()
        assert rc.range_par_total(16) == ((1 << 64) - 1) // 16

    def test_upper_bound_overflow_raises(self):
        rc = RangeCoder()
        rc.set_state((1 << 64) - 1, 2)
        with pytest.raises(errors.UpperBoundOverflow):
            rc.upper_bound()

    def test_left_shift_pops_top_byte(self):
        rc = RangeCoder()
        rc.set_state(0xAB00_0000_0000_0000, 1 << 48)
        assert rc.left_shift() == 0xAB
        assert rc.lower_bound == 0
        assert rc.range == 1 << 56

    def test_emission_bound(self):
        """No single param_update may emit more than MAX_BYTES_PER_SYMBOL."""
        from range_coder_rust_tpu import MAX_BYTES_PER_SYMBOL

        rng = np.random.default_rng(7)
        worst = 0
        for _ in range(200):
            K = int(rng.integers(2, 64))
            syms = rng.integers(0, K, 500)
            ft = FreqTable.from_data(syms, K)
            enc = Encoder()
            for s in syms:
                worst = max(worst, enc.encode(ft, int(s)))
        assert worst <= MAX_BYTES_PER_SYMBOL


class TestPropertyRoundTrip:
    @pytest.mark.parametrize("seed", range(8))
    def test_random_corpora(self, seed):
        rng = np.random.default_rng(seed)
        K = int(rng.integers(1, 512))
        n = int(rng.integers(1, 4000))
        syms = rng.integers(0, K, n)
        _, out, _ = roundtrip_scalar(syms, K)
        assert out == list(syms)

    def test_single_symbol_alphabet(self):
        syms = [0] * 100
        code, out, _ = roundtrip_scalar(syms, 1)
        assert out == syms
        # p=1 symbols cost ~0 bits: stream is essentially just the flush
        assert len(code) <= 9

    def test_all_same_symbol_in_bigger_alphabet(self):
        syms = [3] * 1000 + [1]
        _, out, _ = roundtrip_scalar(syms, 5)
        assert out == syms

    def test_heavily_skewed(self):
        rng = np.random.default_rng(1)
        syms = np.where(rng.random(5000) < 0.999, 0, 1)
        code, out, ft = roundtrip_scalar(syms, 2)
        assert out == list(syms)
        # achieved size should be within a few bytes of the Shannon bound
        ideal_bits = sum(ft.ideal_code_length(int(s)) for s in syms)
        assert len(code) <= ideal_bits / 8 + 64

    def test_two_long_runs(self):
        syms = [0] * 3000 + [1] * 3000
        _, out, _ = roundtrip_scalar(syms, 2)
        assert out == syms

    def test_alphabet_255_256(self):
        rng = np.random.default_rng(2)
        for K in (255, 256, 257):
            syms = rng.integers(0, K, 800)
            _, out, _ = roundtrip_scalar(syms, K)
            assert out == list(syms)


class TestErrors:
    def test_truncated_stream(self):
        with pytest.raises(errors.TruncatedStream):
            Decoder(b"\x00\x01\x02")  # < 8 bytes cannot prime the window

    def test_truncated_mid_stream(self):
        code, _, ft = roundtrip_scalar(EXAMPLE_DATA, 10)
        dec = Decoder(code[:9])
        with pytest.raises(errors.TruncatedStream):
            for _ in EXAMPLE_DATA:
                dec.decode(ft)

    def test_zero_total_raises(self):
        with pytest.raises(errors.TableError):
            FreqTable.from_counts([0, 0, 0])

    def test_ideal_code_length_zero_freq(self):
        ft = FreqTable.from_counts([1, 0, 3])
        with pytest.raises(ValueError):
            ft.ideal_code_length(1)

    def test_ideal_code_length_value(self):
        ft = FreqTable.from_counts([1, 1, 2])
        assert ft.ideal_code_length(2) == pytest.approx(1.0)
        assert ft.ideal_code_length(0) == pytest.approx(2.0)


class TestCppGoldenConformance:
    def test_example_stream_identical(self):
        code, _, ft = roundtrip_scalar(EXAMPLE_DATA, 10)
        cc = golden.encode(
            np.array(EXAMPLE_DATA), ft.counts(), ft.cum_counts(), ft.total_freq()
        )
        assert cc == code

    @pytest.mark.parametrize("seed", range(5))
    def test_random_streams_identical(self, seed):
        rng = np.random.default_rng(100 + seed)
        K = int(rng.integers(2, 400))
        syms = rng.integers(0, K, int(rng.integers(1, 3000)))
        ft = FreqTable.from_data(syms, K)
        enc = Encoder()
        for s in syms:
            enc.encode(ft, int(s))
        py_code = enc.finish()
        cc_code = golden.encode(syms, ft.counts(), ft.cum_counts(), ft.total_freq())
        assert py_code == cc_code
        back = golden.decode(
            cc_code, len(syms), ft.counts(), ft.cum_counts(), ft.total_freq()
        )
        assert np.array_equal(back, syms.astype(np.uint32))

    def test_step_matches_python(self):
        rng = np.random.default_rng(3)
        rc_total = 1 << 16
        for _ in range(300):
            low = int(rng.integers(0, 1 << 63))
            range_ = int(rng.integers(1 << 48, 1 << 63))
            c = int(rng.integers(1, 1 << 12))
            cum = int(rng.integers(0, rc_total - c))
            rc = RangeCoder()
            rc.set_state(low, range_)
            try:
                py_bytes = rc.param_update(c, cum, rc_total)
            except errors.RangeCoderError:
                continue
            lo, rg, cc_bytes = golden.step(low, range_, c, cum, rc_total)
            assert (lo, rg) == rc.state()
            assert cc_bytes == py_bytes
