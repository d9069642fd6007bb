"""Phred error-rate parity (/root/reference/tests/test__fastq.py:6-25)."""

import pytest

from fastqdedup_spark import average_error_rate


def test_two_scores_offset_0():
    # chr(10)=q10 -> 0.1, chr(30)=q30 -> 0.001; mean = 0.0505
    assert average_error_rate(chr(10) + chr(30), phred_offset=0) == pytest.approx(0.0505)


def test_two_scores_default_offset():
    assert average_error_rate(chr(43) + chr(63)) == pytest.approx(0.0505)


def test_out_of_range():
    for char in [chr(c) for c in range(0, 33)] + [chr(c) for c in range(127, 256)]:
        if not char.isascii():
            continue
        with pytest.raises(ValueError):
            average_error_rate(char)


def test_empty():
    assert average_error_rate("") == 0.0
