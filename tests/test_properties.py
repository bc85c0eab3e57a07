"""Property-based tests (hypothesis) for the pure-Python building blocks.

These need no SparkSession, so hypothesis can hammer hundreds of random
cases per second: the BMP codec behind multimodal_decode, and the
linefile reader's split planner + straddle rule — the reference's core
input contract (LineRecordReader.h:14-119), which must lose and
duplicate nothing for ANY content and ANY split size.
"""

from __future__ import annotations

import os
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from tiny_mapreduce_rpc_server_spark.operators.multimodal import (
    _bmp_decode_py,
    _bmp_encode,
)
from tiny_mapreduce_rpc_server_spark.sources.linefile import LineFileReader


@given(
    w=st.integers(min_value=1, max_value=200),
    h=st.integers(min_value=1, max_value=100),
    color=st.integers(min_value=0, max_value=255),
)
def test_bmp_codec_roundtrip(w, h, color):
    got_w, got_h, got_mean = _bmp_decode_py(_bmp_encode(w, h, color))
    assert (got_w, got_h) == (w, h)
    assert got_mean == float(color)  # solid fill => exact mean


_LINE_ALPHABET = st.characters(
    codec="utf-8", exclude_characters="\n\r", categories=("L", "N", "P", "Zs")
)


@given(
    lines=st.lists(st.text(alphabet=_LINE_ALPHABET, max_size=30), max_size=20),
    split_size=st.integers(min_value=1, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_linefile_straddle_rule_exact_for_any_split_size(lines, split_size):
    """Every line is read exactly once, by the split where it STARTS,
    with its true byte offset — for arbitrary content (incl. empty lines
    and multibyte UTF-8) and arbitrary split sizes down to 1 byte."""
    data = "".join(line + "\n" for line in lines).encode("utf-8")
    with tempfile.NamedTemporaryFile(delete=False) as fh:
        fh.write(data)
        path = fh.name
    try:
        reader = LineFileReader({"path": path, "split_size": str(split_size)})
        records = []
        for part in reader.partitions():
            records.extend(reader.read(part))
    finally:
        os.unlink(path)

    # expected: (byte offset of line start, line)
    expected, pos = [], 0
    for line in lines:
        expected.append((pos, line))
        pos += len(line.encode("utf-8")) + 1
    assert records == expected


@given(
    st.integers(min_value=0, max_value=1023),
    st.integers(min_value=0, max_value=1023),
)
@settings(max_examples=200, deadline=None)
def test_zorder_expression_interleaves_exactly(x, y):
    """The generated SQL z-expression must equal the reference bit
    interleave (x in even bits, y in odd bits) and be injective — checked
    by deinterleaving back to (x, y). Evaluated through DuckDB so the
    exact SQL text both engines run is what's tested."""
    import duckdb

    from tiny_mapreduce_rpc_server_spark.sources.formats import _Z_BITS, _z_expr

    (z,) = duckdb.sql(
        f"SELECT {_z_expr(str(x), str(y))}"
    ).fetchone()
    ref = 0
    for i in range(_Z_BITS):
        ref |= ((x >> i) & 1) << (2 * i)
        ref |= ((y >> i) & 1) << (2 * i + 1)
    assert z == ref
    back_x = sum(((z >> (2 * i)) & 1) << i for i in range(_Z_BITS))
    back_y = sum(((z >> (2 * i + 1)) & 1) << i for i in range(_Z_BITS))
    assert (back_x, back_y) == (x, y)


def test_cluster_pair_candidates_drop_zero_norm():
    """Zero-norm contract (settled round 7): a zero-norm vector's cosine
    is undefined — the DuckDB oracle's division by zero yields NULL and
    ``NULL >= t`` DROPS the pair, while ANSI Spark (the driver's vanilla
    default) would THROW if such a pair reached the exact cosine. The
    BLAS kernel's NaN scores (0 * inf) compare False against the margin,
    so pairs touching a zero-norm row are EXCLUDED in the candidate
    phase — matching the oracle and never tripping ANSI division."""
    import pandas as pd

    from tiny_mapreduce_rpc_server_spark.operators.ml import (
        SEMANTIC_DUP,
        _cluster_pair_candidates,
    )

    fn = _cluster_pair_candidates(SEMANTIC_DUP - 1e-9)
    pdf = pd.DataFrame(
        {"vec_id": [1, 2, 3, 4],
         "v": [[0.0, 0.0], [1.0, 0.0], [-1.0, 0.0], [1.0, 1e-9]]}
    )
    out = fn((7,), pdf)
    pairs = set(zip(out["vec_a"], out["vec_b"]))
    # the zero-norm row pairs with NOTHING
    assert not any(1 in p for p in pairs), pairs
    # finite near-parallel pair still found
    assert (2, 4) in pairs, pairs
    # finite anti-parallel pair is a normal BLAS reject
    assert (2, 3) not in pairs, pairs
    assert set(out["cluster"]) == {7}
