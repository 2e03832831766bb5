"""Baseline JPEG codec (functions/jpeg.py): spec cross-checks + round trips.

The encoder and decoder are both in-repo, so round-trip tests alone could
pass with a shared mistake (e.g. a wrong zigzag in both directions). The
spec tests pin the published constants independently: the zigzag walk, the
Annex K table shapes, canonical Huffman code assignment, and the DCT
against the O(n^4) textbook definition.
"""

import numpy as np
import pytest

from zarr_datafusion_search_spark.functions.jpeg import (
    AC_CHROMA_BITS,
    AC_CHROMA_VALS,
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QUANT_LUMA,
    ZIGZAG,
    _build_codes,
    _T,
    decode_jpeg,
    encode_jpeg,
    quant_tables,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ],
        axis=2,
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# spec cross-checks (published constants, independent of the codec code)
# ---------------------------------------------------------------------------


def test_zigzag_matches_spec():
    """First/last entries of the published zigzag sequence (ITU-T T.81
    figure 5) and the full involution property."""
    expected_prefix = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert list(ZIGZAG[:16]) == expected_prefix
    assert list(ZIGZAG[-8:]) == [53, 60, 61, 54, 47, 55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))


def test_annex_k_table_shapes():
    assert sum(DC_LUMA_BITS) == len(DC_LUMA_VALS) == 12
    assert sum(AC_LUMA_BITS) == len(AC_LUMA_VALS) == 162
    assert sum(AC_CHROMA_BITS) == len(AC_CHROMA_VALS) == 162
    assert QUANT_LUMA[0] == 16 and QUANT_LUMA[63] == 99


def test_canonical_huffman_codes():
    """DC luminance canonical assignment per the spec: symbol 0 gets the
    single 2-bit code 00; symbols 1-5 the 3-bit codes 010..110; prefix-free
    throughout."""
    codes = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    assert codes[0] == (2, 0b00)
    assert codes[1] == (3, 0b010)
    assert codes[5] == (3, 0b110)
    assert codes[6] == (4, 0b1110)
    assert codes[11] == (9, 0b111111110)
    # prefix-free: no code is a prefix of a longer one
    all_codes = sorted(codes.values())
    for (l1, c1) in all_codes:
        for (l2, c2) in all_codes:
            if l1 < l2:
                assert (c2 >> (l2 - l1)) != c1


def test_dct_matrix_against_textbook_definition():
    """T @ B @ T.T must equal the O(n^4) DCT-II double sum."""
    rng = np.random.default_rng(3)
    block = rng.uniform(-128, 127, (8, 8))
    fast = _T @ block @ _T.T
    slow = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = np.sqrt(1 / 8) if u == 0 else 0.5
            cv = np.sqrt(1 / 8) if v == 0 else 0.5
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (
                        block[y, x]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            slow[u, v] = cu * cv * s
    assert np.allclose(fast, slow, atol=1e-9)
    # orthonormal: IDCT inverts exactly
    assert np.allclose(_T.T @ fast @ _T, block, atol=1e-9)


def test_quality_scaling():
    l50, c50 = quant_tables(50)
    assert np.array_equal(l50, QUANT_LUMA)
    l100, _ = quant_tables(100)
    assert l100.max() == 1  # lossless-quantizer limit
    l10, _ = quant_tables(10)
    assert (l10 >= l50).all() and l10.max() > l50.max()


# ---------------------------------------------------------------------------
# wire format
# ---------------------------------------------------------------------------


def test_marker_structure():
    b = encode_jpeg(_gradient(16, 16), 90)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in b


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG1234")
    b = bytearray(encode_jpeg(_gradient(8, 8), 90))
    sof = b.index(b"\xff\xc0")
    b[sof + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(b))


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
def test_gradient_roundtrip(sub):
    img = _gradient(40, 56)
    out = decode_jpeg(encode_jpeg(img, 90, sub))
    assert out.shape == img.shape
    diff = np.abs(out.astype(int) - img.astype(int))
    assert diff.max() <= 12 and diff.mean() < 3


def test_flat_color_is_lossless_at_q100():
    """Constant blocks survive quality 100 exactly — the property the
    multimodal_real_jpeg_features oracle relies on — across sizes,
    subsampling, and restart intervals (the registered fixture grid)."""
    for i in range(0, 120):
        w, h = i % 12 + 4, i % 10 + 4
        img = np.zeros((h, w, 3), np.uint8)
        for c in range(3):
            img[:, :, c] = (i * 31 + 97 * c) % 256
        out = decode_jpeg(
            encode_jpeg(
                img,
                100,
                "4:2:0" if i % 2 else "4:4:4",
                restart_interval=i % 3,
            )
        )
        assert np.array_equal(out, img), f"id {i} not lossless"


def test_grayscale_roundtrip():
    g = _gradient(24, 40)[:, :, 0]
    out = decode_jpeg(encode_jpeg(g, 85))
    assert out.shape == (24, 40, 1)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 12


def test_restart_markers_roundtrip():
    img = _gradient(48, 64)
    for ri in (1, 3, 7):
        b = encode_jpeg(img, 90, "4:2:0", restart_interval=ri)
        assert b"\xff\xdd" in b  # DRI segment
        assert any(bytes([0xFF, 0xD0 + k]) in b for k in range(8))
        out = decode_jpeg(b)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 12


def test_non_multiple_of_mcu_sizes():
    for h, w in ((9, 13), (17, 31), (8, 8), (15, 23)):
        img = _gradient(h, w)
        for sub in ("4:4:4", "4:2:0"):
            out = decode_jpeg(encode_jpeg(img, 92, sub))
            assert out.shape == (h, w, 3)


def test_quality_monotonicity():
    img = _gradient(32, 32)
    errs, sizes = [], []
    for q in (30, 60, 90):
        b = encode_jpeg(img, q)
        out = decode_jpeg(b)
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
        sizes.append(len(b))
    assert errs[0] >= errs[1] >= errs[2]
    assert sizes[0] <= sizes[2]


def test_decode_image_dispatch():
    from zarr_datafusion_search_spark.functions.media_codecs import (
        SUPPORTED_IMAGE_FORMATS,
        decode_image,
        encode_image,
    )

    assert "image/jpeg" in SUPPORTED_IMAGE_FORMATS
    img = np.full((16, 16, 3), 88, np.uint8)
    out = decode_image(encode_image(img, "image/jpeg"), "image/jpeg")
    assert np.array_equal(out, img)


# ---------------------------------------------------------------------------
# property tests
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        seed=st.integers(0, 2**32 - 1),
        ri=st.integers(0, 3),
    )
    def test_property_noise_roundtrip_444(h, w, seed, ri):
        """Any uint8 RGB image of any size round-trips under 4:4:4 at
        quality 95 with shape preserved and bounded error — even white
        noise, the worst case for a DCT codec."""
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, 95, "4:4:4", restart_interval=ri))
        assert out.shape == img.shape
        diff = np.abs(out.astype(int) - img.astype(int))
        assert diff.max() <= 40 and diff.mean() <= 10

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        a=st.integers(0, 255),
        b=st.integers(0, 255),
        c=st.integers(0, 255),
        ri=st.integers(0, 3),
    )
    def test_property_smooth_roundtrip_420(h, w, a, b, c, ri):
        """4:2:0 averages chroma over 2x2 (pixel-level noise is lossy BY
        DESIGN there), so its property bound uses smooth low-frequency
        content: arbitrary linear gradients of arbitrary size stay tight."""
        yy, xx = np.mgrid[0:h, 0:w]
        # saturating (not wrapping) ramps: modulo wrap-around would put a
        # 255 -> 0 edge in the middle of a "smooth" image
        img = np.stack(
            [
                np.minimum(a + xx * 2, 255),
                np.minimum(b + yy * 2, 255),
                np.full_like(xx, c),
            ],
            axis=2,
        ).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, 95, "4:2:0", restart_interval=ri))
        assert out.shape == img.shape
        diff = np.abs(out.astype(int) - img.astype(int))
        assert diff.max() <= 30 and diff.mean() <= 8

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_multi_scan_gated_loudly():
    """A baseline file whose first SOS covers fewer components than the
    SOF must raise (decoding only the Y scan would silently return
    color-shifted pixels) — simulate by patching the SOS component count
    of a real 3-component file down to 1."""
    b = bytearray(encode_jpeg(_gradient(16, 16), 90))
    sos = b.index(b"\xff\xda")
    assert b[sos + 4] == 3  # ns
    # rewrite the SOS payload: 1 component (Y), keep its 2-byte entry,
    # then the 3 spectral bytes follow immediately
    ns_off = sos + 4
    comp1 = bytes(b[ns_off + 1 : ns_off + 3])
    spectral = bytes(b[ns_off + 7 : ns_off + 10])
    new_payload = bytes([1]) + comp1 + spectral
    b[sos + 2 : sos + 4] = (len(new_payload) + 2).to_bytes(2, "big")
    b[ns_off : ns_off + 10] = new_payload
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg(bytes(b))


def test_truncated_entropy_stream_raises_valueerror():
    """A payload cut mid-scan must fail with ValueError (the loud-failure
    contract), never a bare IndexError."""
    b = encode_jpeg(_gradient(32, 32), 90)
    sos = b.index(b"\xff\xda")
    for cut in (sos + 20, len(b) - 40):
        with pytest.raises(ValueError):
            decode_jpeg(b[:cut])


def test_truncated_header_raises_valueerror():
    """Cuts inside the HEADER region (before the entropy stream) must hit
    the round-6 guards — ends-inside-a-marker, missing segment length,
    segment-overruns-payload — each raising the contracted ValueError,
    never IndexError/struct.error (jpeg.py marker walk)."""
    b = encode_jpeg(_gradient(16, 16), 90)
    sos = b.index(b"\xff\xda")
    # 6 cut points spanning the marker walk: right after SOI, mid-first
    # segment length, after first marker byte, two mid-header cuts, and
    # just before SOS
    for cut in (2, 3, 4, sos // 3, 2 * sos // 3, sos - 1):
        with pytest.raises(ValueError):
            decode_jpeg(b[:cut])


def test_fill_bytes_before_marker_decode_identically():
    """T.81 B.1.1.2: any run of 0xFF fill bytes may pad before a marker
    code; inserting them before each header marker must not change the
    decoded pixels."""
    b = encode_jpeg(_gradient(16, 16), 90)
    ref = decode_jpeg(b)
    sos = b.index(b"\xff\xda")
    padded = bytearray()
    pos = 0
    while pos < sos:
        # pad before every post-SOI header marker (never before SOI: the
        # two SOI bytes must open the payload verbatim)
        if (
            pos >= 2
            and b[pos] == 0xFF
            and pos + 1 < len(b)
            and b[pos + 1] != 0x00
        ):
            padded += b"\xff\xff\xff"  # fill bytes, then the real marker
        padded.append(b[pos])
        pos += 1
    padded += b[sos:]
    got = decode_jpeg(bytes(padded))
    assert got.shape == ref.shape
    assert (got == ref).all()
