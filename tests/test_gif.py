"""Stdlib GIF codec: LZW round-trip, interlace, and the DataFrame ops."""

import numpy as np
import pytest

from mindb_spark.multimodal.gif import decode_gif, encode_gif, is_gif


def _img(h, w, colors, seed=0):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, colors, (h, w))]


def test_gif_roundtrip_small_palettes():
    for colors in (2, 5, 16, 200):
        img = _img(23, 31, colors, seed=colors)
        payload = encode_gif(img)
        assert is_gif(payload)
        got = decode_gif(payload)
        np.testing.assert_array_equal(got, img)


def test_gif_roundtrip_exercises_width_growth():
    # >= 2^min_code_size distinct sequences force LZW code-width bumps
    img = _img(64, 64, 256, seed=3)
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)


def test_gif_rejects_garbage_and_too_many_colors():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    rng = np.random.default_rng(1)
    # 32x32 random RGB has ~1024 distinct colors with overwhelming odds
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(NotImplementedError):
        encode_gif(img)


def test_gif_extension_blocks_skipped():
    img = _img(8, 8, 4, seed=7)
    payload = bytearray(encode_gif(img))
    # splice a Graphic Control Extension before the image descriptor
    idx = payload.index(0x2C)
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    patched = bytes(payload[:idx]) + gce + bytes(payload[idx:])
    np.testing.assert_array_equal(decode_gif(patched), img)


def test_gif_interlaced_decode():
    """Hand-build an interlaced GIF: permute the rows into the 4-pass
    storage order, set the interlace flag, and check the decoder
    reassembles the original raster."""
    import struct

    from mindb_spark.multimodal.gif import _lzw_encode

    h, w = 16, 10
    img = _img(h, w, 4, seed=11)
    flat = img.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    idx = inv.astype(np.uint8).reshape(h, w)
    pass_rows = np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])
    stored = idx[pass_rows].ravel()  # rows in interlace storage order
    bits = 2  # 4-color palette
    n_pal = 1 << bits
    pal_bytes = np.zeros((n_pal, 3), dtype=np.uint8)
    pal_bytes[: len(pal)] = pal
    mcs = 2
    body = _lzw_encode(mcs, stored)
    blocks = b"".join(
        bytes([min(255, len(body) - i)]) + body[i : i + 255]
        for i in range(0, len(body), 255)
    )
    payload = (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
        + pal_bytes.tobytes()
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlace flag
        + bytes([mcs]) + blocks + b"\x00" + b"\x3b"
    )
    np.testing.assert_array_equal(decode_gif(payload), img)


def test_decode_images_real_gif(spark):
    img = _img(20, 14, 8, seed=5)
    from mindb_spark.multimodal import decode_images

    df = spark.createDataFrame(
        [(1, bytearray(encode_gif(img)))], "doc_id long, content binary"
    )
    row = decode_images(df, fake=False).collect()[0]
    assert (row.height, row.width, row.channels) == (20, 14, 3)
    flat = img.reshape(-1)
    hist = np.bincount(flat >> 5, minlength=8) / flat.size
    np.testing.assert_allclose(np.array(row.features), hist, atol=1e-12)


def test_resize_images_real_gif(spark):
    img = _img(32, 32, 6, seed=9)
    from mindb_spark.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, bytearray(encode_gif(img)))], "doc_id long, content binary"
    )
    row = resize_images(df, target=(8, 16), fake=False).collect()[0]
    assert (row.height, row.width) == (8, 16)
    got = decode_gif(bytes(row.content))
    rows = np.minimum((np.arange(8) * 32) // 8, 31)
    cols = np.minimum((np.arange(16) * 32) // 16, 31)
    np.testing.assert_array_equal(got, img[rows[:, None], cols[None, :]])


# ---------------------------------------------------------------- animation


def test_gif_animation_roundtrip_full_frames():
    from mindb_spark.multimodal.gif import decode_gif_frames, encode_gif_animation

    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 6, (9, 7))] for _ in range(4)]
    payload = encode_gif_animation(frames)
    got = decode_gif_frames(payload)
    assert len(got) == 4
    for g, f in zip(got, frames):
        np.testing.assert_array_equal(g, f)
    # decode_gif = first composited frame
    np.testing.assert_array_equal(decode_gif(payload), frames[0])


def test_gif_animation_disposal_offsets_transparency():
    """Hand-check the GIF89a compositing semantics: offsets, a
    transparency key that leaves the underlying canvas visible, and
    disposal 2 (restore-background) between frames."""
    from mindb_spark.multimodal.gif import decode_gif_frames, encode_gif_animation

    BG = np.array([200, 0, 0], np.uint8)
    A = np.array([0, 0, 255], np.uint8)
    B = np.array([0, 255, 0], np.uint8)
    C = np.array([255, 255, 0], np.uint8)
    T = np.array([1, 2, 3], np.uint8)  # transparency key

    f0 = np.broadcast_to(A, (6, 8, 3)).copy()
    f1 = np.broadcast_to(B, (3, 4, 3)).copy()
    f1[0, 0] = T
    f1[2, 3] = T
    f2 = np.broadcast_to(C, (2, 2, 3)).copy()

    payload = encode_gif_animation(
        [f0, f1, f2],
        offsets=[(0, 0), (2, 1), (0, 0)],  # (x, y)
        disposals=[0, 2, 0],
        transparent_color=tuple(T),
        canvas=(6, 8),
        background=tuple(BG),
    )
    got = decode_gif_frames(payload)
    assert len(got) == 3

    exp0 = np.broadcast_to(A, (6, 8, 3)).copy()
    np.testing.assert_array_equal(got[0], exp0)

    exp1 = exp0.copy()
    region = exp1[1:4, 2:6]
    mask = ~np.all(f1 == T, axis=-1)
    region[mask] = f1[mask]
    np.testing.assert_array_equal(got[1], exp1)

    # disposal 2 on frame 1: its rect restored to background before frame 2
    exp2 = exp0.copy()
    exp2[1:4, 2:6] = BG
    exp2[0:2, 0:2] = C
    np.testing.assert_array_equal(got[2], exp2)


def test_gif_animation_disposal_restore_previous():
    from mindb_spark.multimodal.gif import decode_gif_frames, encode_gif_animation

    A = np.array([10, 20, 30], np.uint8)
    B = np.array([40, 50, 60], np.uint8)
    f0 = np.broadcast_to(A, (4, 4, 3)).copy()
    f1 = np.broadcast_to(B, (2, 2, 3)).copy()
    f2 = np.broadcast_to(B, (1, 1, 3)).copy()
    payload = encode_gif_animation(
        [f0, f1, f2],
        offsets=[(0, 0), (1, 1), (3, 3)],
        disposals=[0, 3, 0],  # frame 1: restore-previous after display
        canvas=(4, 4),
    )
    got = decode_gif_frames(payload)
    exp1 = f0.copy()
    exp1[1:3, 1:3] = B
    np.testing.assert_array_equal(got[1], exp1)
    # frame 1's rect was restored to frame 0 contents before frame 2 drew
    exp2 = f0.copy()
    exp2[3:4, 3:4] = B
    np.testing.assert_array_equal(got[2], exp2)


def test_gif_frames_max_frames_prefix():
    from mindb_spark.multimodal.gif import decode_gif_frames, encode_gif_animation

    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    frames = [pal[np.full((3, 3), i % 2)] for i in range(5)]
    payload = encode_gif_animation(frames)
    assert len(decode_gif_frames(payload, max_frames=2)) == 2
    assert len(decode_gif_frames(payload)) == 5


def test_sample_frames_real_gif(spark):
    from mindb_spark.multimodal import sample_frames
    from mindb_spark.multimodal.gif import decode_gif_frames, encode_gif_animation
    from mindb_spark.multimodal.png import decode_png

    rng = np.random.default_rng(33)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 4, (8, 6))] for _ in range(6)]
    payload = encode_gif_animation(frames)
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, content binary"
    )
    rows = sample_frames(df, every_n=2, fake=False).orderBy("frame_no").collect()
    assert [r.frame_no for r in rows] == [0, 2, 4]
    composited = decode_gif_frames(payload)
    for r in rows:
        np.testing.assert_array_equal(
            decode_png(bytes(r.frame)), composited[r.frame_no]
        )


def test_sample_frames_real_png_single_frame(spark):
    from mindb_spark.multimodal import sample_frames
    from mindb_spark.multimodal.png import decode_png, encode_png

    rng = np.random.default_rng(40)
    img = rng.integers(0, 256, (5, 9, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(img)))], "doc_id long, content binary"
    )
    rows = sample_frames(df, every_n=10, fake=False).collect()
    assert len(rows) == 1 and rows[0].frame_no == 0
    np.testing.assert_array_equal(decode_png(bytes(rows[0].frame)), img)


def test_sample_frames_real_honest_gate(spark):
    from mindb_spark.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\x01video-bytes" * 40))], "doc_id long, content binary"
    )
    with pytest.raises(Exception, match="media library|NotImplemented"):
        sample_frames(df, fake=False).collect()
