"""Periodic-column combinators (reference src/utils/periodic_columns.rs)."""
from certificate_stark_tpu.utils.periodic import fill, pad, stitch


def test_stitch_fill_pad():
    cols = [[], [1]]
    stitch(cols, [[7, 8]], [(0, 0)])
    assert cols[0] == [7, 8]
    fill(cols, [[2, 3]], [(0, 1)], 6)
    assert cols[1] == [1, 2, 3, 2, 3, 2]  # repeats the pattern up to length
    pad(cols, [0], 5, 0)
    assert cols[0] == [7, 8, 0, 0, 0]
