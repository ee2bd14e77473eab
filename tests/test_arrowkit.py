"""arrowkit: zero-copy pyarrow->numpy bridges used by every Arrow kernel.

The fast paths must reproduce the slow per-row conversion exactly, and
the guards must refuse (return None) on every layout the fast path
cannot represent — a wrong matrix here silently corrupts ANN distances.
No Spark session needed.
"""

import numpy as np
import pyarrow as pa

from mindb_spark.arrowkit import (
    fixed_width_matrix,
    flat_values,
    nested_matrix,
    one_chunk,
)


def test_fixed_width_list_roundtrip():
    rows = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    mat = fixed_width_matrix(pa.array(rows, type=pa.list_(pa.float64())))
    assert mat.tolist() == rows


def test_fixed_width_list_sliced():
    arr = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]).slice(1, 2)
    assert fixed_width_matrix(arr).tolist() == [[3.0, 4.0], [5.0, 6.0]]


def test_fixed_width_binary_roundtrip_and_slice():
    arr = pa.array([b"ab", b"cd", b"ef"], type=pa.binary())
    assert fixed_width_matrix(arr, 2).tobytes() == b"abcdef"
    assert fixed_width_matrix(arr.slice(1, 2), 2).tobytes() == b"cdef"


def test_ragged_and_null_refused():
    assert fixed_width_matrix(pa.array([[1.0], [2.0, 3.0]])) is None
    assert fixed_width_matrix(pa.array([[1.0, 2.0], None])) is None
    assert fixed_width_matrix(pa.array([[1.0, None]])) is None
    assert fixed_width_matrix(pa.array([b"a", b"bc"], type=pa.binary())) is None
    # declared width must match
    assert fixed_width_matrix(pa.array([[1.0, 2.0]]), 3) is None


def test_empty_arrays():
    m = fixed_width_matrix(pa.array([], type=pa.list_(pa.float64())), 4)
    assert m.shape == (0, 4)
    b = fixed_width_matrix(pa.array([], type=pa.binary()), 8)
    assert b.shape == (0, 8)


def test_flat_values_windows_slices():
    arr = pa.array([[1, 2, 3], [4], [5, 6]], type=pa.list_(pa.int64()))
    flat, offs = flat_values(arr)
    assert flat.tolist() == [1, 2, 3, 4, 5, 6] and offs.tolist() == [0, 3, 4, 6]
    flat, offs = flat_values(arr.slice(1, 2))
    assert flat.tolist() == [4, 5, 6] and offs.tolist() == [0, 1, 3]


def test_nested_matrix_buckets():
    buckets = [
        [[1.0, 0.0], [0.0, 1.0]],          # bucket 0: 2 rows
        [[2.0, 2.0]],                       # bucket 1: 1 row
        [[3.0, 3.0], [4.0, 4.0], [5.0, 5.0]],
    ]
    arr = pa.array(buckets, type=pa.list_(pa.list_(pa.float64())))
    mat, offs = nested_matrix(arr)
    assert offs.tolist() == [0, 2, 3, 6]
    assert mat[offs[1] : offs[2]].tolist() == [[2.0, 2.0]]
    assert mat[offs[2] : offs[3]].tolist() == buckets[2]
    # sliced outer array: offsets re-window, matrix covers only the slice
    mat2, offs2 = nested_matrix(arr.slice(1, 2))
    assert offs2.tolist() == [0, 1, 4]
    assert mat2.tolist() == [[2.0, 2.0]] + buckets[2]


def test_nested_matrix_refuses_ragged_inner():
    arr = pa.array([[[1.0, 2.0]], [[3.0]]], type=pa.list_(pa.list_(pa.float64())))
    assert nested_matrix(arr) is None


def test_one_chunk_concatenates():
    t = pa.Table.from_batches(
        [
            pa.RecordBatch.from_arrays([pa.array([1, 2])], ["x"]),
            pa.RecordBatch.from_arrays([pa.array([3])], ["x"]),
        ]
    )
    assert one_chunk(t.column("x")).to_pylist() == [1, 2, 3]


def test_fixed_width_matrix_chunked_stacks_chunks():
    from mindb_spark.arrowkit import fixed_width_matrix_chunked

    c = pa.chunked_array(
        [
            pa.array([[1.0, 2.0], [3.0, 4.0]], type=pa.list_(pa.float64())),
            pa.array([[5.0, 6.0]], type=pa.list_(pa.float64())),
        ]
    )
    mat = fixed_width_matrix_chunked(c, 2)
    assert mat.tolist() == [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    # binary flavor
    cb = pa.chunked_array(
        [pa.array([b"ab", b"cd"]), pa.array([b"ef"])]
    )
    mb = fixed_width_matrix_chunked(cb, 2)
    assert mb.tobytes() == b"abcdef" and mb.shape == (3, 2)


def test_fixed_width_matrix_chunked_single_chunk_is_view():
    from mindb_spark.arrowkit import fixed_width_matrix_chunked

    c = pa.chunked_array([pa.array([[1.0, 2.0]], type=pa.list_(pa.float64()))])
    mat = fixed_width_matrix_chunked(c, 2)
    assert mat.shape == (1, 2) and not mat.flags.owndata  # zero-copy view


def test_fixed_width_matrix_chunked_ragged_or_empty_is_none():
    from mindb_spark.arrowkit import fixed_width_matrix_chunked

    ragged = pa.chunked_array(
        [
            pa.array([[1.0, 2.0]], type=pa.list_(pa.float64())),
            pa.array([[3.0]], type=pa.list_(pa.float64())),
        ]
    )
    assert fixed_width_matrix_chunked(ragged, 2) is None
    empty = pa.chunked_array([], type=pa.list_(pa.float64()))
    assert fixed_width_matrix_chunked(empty, 2) is None
    # an empty chunk between full ones must not poison the stack
    holey = pa.chunked_array(
        [
            pa.array([[1.0, 2.0]], type=pa.list_(pa.float64())),
            pa.array([], type=pa.list_(pa.float64())),
            pa.array([[3.0, 4.0]], type=pa.list_(pa.float64())),
        ]
    )
    assert fixed_width_matrix_chunked(holey, 2).tolist() == [[1.0, 2.0], [3.0, 4.0]]
