"""Direct unit tests for the round-13 entropy-decode rework: the
16-bit-window Huffman LUT, the windowed bit reader, the find-based
entropy segmentation, and the GIF LZW window read. The format-level
golden tests (test_multimodal.py) prove the decoders end-to-end;
these pin the EDGE semantics the rework had to preserve exactly —
EOF on a bit consumed past the end, ValueError on a code no table
entry prefixes, the lone trailing 0xFF that is data rather than a
marker. No SparkSession needed."""

import pytest

from real_time_data_anomaly_detection_spark.operators.multimodal import (
    _entropy_segments,
    _gif_lzw_decode,
    _jpeg_build_huff,
    _JpegBits,
)


def _ref_build(counts, values):
    # the pre-rework canonical walk (T.81 C.2), as reference
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


# the Annex K.3.1 luminance DC table: 12 symbols, lengths 2..9
_K_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_K_DC_VALUES = bytes(range(12))


def test_lut_matches_canonical_assignment():
    lut = _jpeg_build_huff(_K_DC_COUNTS, _K_DC_VALUES)
    ref = _ref_build(_K_DC_COUNTS, _K_DC_VALUES)
    assert len(lut) == 1 << 16
    for (length, code), sym in ref.items():
        base = code << (16 - length)
        # every window the code prefixes resolves to (sym, length)
        for probe in (base, base + (1 << (16 - length)) - 1):
            ent = lut[probe]
            assert ent == (sym << 5) | length, (length, code, sym)


def test_lut_cache_returns_same_object():
    a = _jpeg_build_huff(_K_DC_COUNTS, _K_DC_VALUES)
    b = _jpeg_build_huff(list(_K_DC_COUNTS), bytes(_K_DC_VALUES))
    assert a is b  # keyed by (counts, values) bytes, not list identity


def test_read_huff_decodes_and_advances():
    lut = _jpeg_build_huff(_K_DC_COUNTS, _K_DC_VALUES)
    ref = _ref_build(_K_DC_COUNTS, _K_DC_VALUES)
    # encode symbols 0..5 back-to-back with the reference codes
    inv = {sym: (ln, code) for (ln, code), sym in ref.items()}
    bitstr = ""
    for sym in range(6):
        ln, code = inv[sym]
        bitstr += format(code, f"0{ln}b")
    pad = (-len(bitstr)) % 8
    data = int(bitstr + "1" * pad, 2).to_bytes((len(bitstr) + pad) // 8, "big")
    bits = _JpegBits(data)
    assert [bits.read_huff(lut) for _ in range(6)] == list(range(6))
    assert bits.pos == len(bitstr)


def test_read_huff_eof_when_code_needs_padding_bits():
    # symbol 0's code is 2 bits ("00"); give the reader ONE real bit —
    # the zero-padded window matches the code but consuming 2 bits
    # passes the end, which must raise EOFError exactly like the
    # per-bit walk did
    lut = _jpeg_build_huff(_K_DC_COUNTS, _K_DC_VALUES)
    bits = _JpegBits(b"\x00")
    bits.pos = 7  # one bit left
    with pytest.raises(EOFError):
        bits.read_huff(lut)


def test_read_huff_invalid_code_raises_valueerror():
    # a table with ONLY the 1-bit code "0": the all-ones window has no
    # matching prefix at any length
    counts = [1] + [0] * 15
    lut = _jpeg_build_huff(counts, b"\x07")
    bits = _JpegBits(b"\xff\xff")
    with pytest.raises(ValueError):
        bits.read_huff(lut)


def test_read_bits_windows_and_eof():
    bits = _JpegBits(bytes([0b10110100, 0b11000001]))
    assert bits.read_bits(3) == 0b101
    assert bits.read_bits(0) == 0
    assert bits.read_bits(9) == 0b101001100
    assert bits.read_bits(4) == 0b0001
    with pytest.raises(EOFError):
        bits.read_bits(1)


def test_read_bits_matches_per_bit_walk():
    import hashlib

    data = hashlib.sha256(b"window-read parity").digest()
    a, b = _JpegBits(data), _JpegBits(data)
    widths = [1, 3, 16, 7, 2, 11, 1, 8, 16, 5] * 4
    for n in widths:
        if a.pos + n > a.nbits:
            break
        want = 0
        for _ in range(n):
            want = (want << 1) | b.read_bit()
        assert a.read_bits(n) == want


def test_entropy_segments_trailing_lone_ff_is_data():
    segs, i = _entropy_segments(b"\x12\x34\xff", 0)
    assert segs == [b"\x12\x34\xff"] and i == 3


def test_entropy_segments_stuffing_rst_and_marker():
    payload = b"\x01\xff\x00\x02\xff\xd0\x03\xff\xd9"
    segs, i = _entropy_segments(payload, 0)
    assert segs == [b"\x01\xff\x02", b"\x03"]
    assert payload[i : i + 2] == b"\xff\xd9"  # stops AT the marker


def test_gif_lzw_window_read_roundtrip():
    # 2-bit alphabet {0,1,2,3}: emit clear, 0, 1, 2, 3, eoi at growing
    # code widths and check the classic LZW table growth path
    min_code = 2
    clear, eoi = 4, 5
    codes = [clear, 0, 1, 2, 3, eoi]
    bitstr, size, table_len = "", 3, 6
    first_after_clear = True
    for c in codes:
        bitstr += format(c, f"0{size}b")[::-1]  # LSB-first
        if c == clear:
            size, table_len = 3, 6
            first_after_clear = True
            continue
        if c == eoi:
            continue
        if first_after_clear:  # no table growth on the first code
            first_after_clear = False
            continue
        table_len += 1
        if table_len == (1 << size):
            size += 1
    bitstr += "0" * ((-len(bitstr)) % 8)
    data = bytes(
        int(bitstr[i : i + 8][::-1], 2) for i in range(0, len(bitstr), 8)
    )
    assert _gif_lzw_decode(min_code, data) == [0, 1, 2, 3]


def test_read_bits_wide_reads_match_per_bit_walk():
    # a malformed DHT can emit a raw-byte "category" symbol > 16; the
    # windowed fast path must defer to the per-bit walk there so
    # hostile input decodes (or EOFs) exactly as before the rework
    import hashlib

    data = hashlib.sha256(b"wide read parity").digest()
    a, b = _JpegBits(data), _JpegBits(data)
    for n in (17, 33, 64, 100):
        want = 0
        for _ in range(n):
            want = (want << 1) | b.read_bit()
        assert a.read_bits(n) == want
    assert a.pos == b.pos
    a.pos = len(data) * 8 - 10
    with pytest.raises(EOFError):
        a.read_bits(40)


# ---------------------------------------------------------------------------
# Baseline-scan inlined symbol loop (round-13 second pass): the DC/AC
# decode no longer goes through _JpegBits — one fused 40-bit window
# read per symbol serves the Huffman LUT lookup and the value bits.
# The tests above no longer cover that path's edges, so these pin the
# inlined loop's abort semantics directly at the _jpeg_gray_pixels
# level: None (never an exception, never a wrong plane) on truncated
# entropy data, on a window no code prefixes, and on a coefficient
# run passing slot 63. Bit-VALUE parity of the inlined loop is pinned
# by test_multimodal.test_builtin_progressive_jpeg_decode (the
# baseline plane must equal the _JpegBits-driven progressive decode
# of the same image, exactly).


def _tiny_jpeg(dc_counts, dc_values, ac_counts, ac_values, entropy_bits):
    """One-component 8×8 baseline JPEG with caller-chosen Huffman
    tables and raw entropy BITS (padded with 1s, 0xFF-stuffed)."""

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + bytes([8] + [1] * 63))
    out += seg(0xC0, b"\x08" + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
               + b"\x01" + b"\x01\x11\x00")
    out += seg(0xC4, b"\x00" + bytes(dc_counts) + dc_values)
    out += seg(0xC4, b"\x10" + bytes(ac_counts) + ac_values)
    out += seg(0xDA, b"\x01" + b"\x01\x00" + b"\x00\x3f\x00")
    bits = entropy_bits + "1" * ((-len(entropy_bits)) % 8)
    ent = bytearray()
    for i in range(0, len(bits), 8):
        b = int(bits[i : i + 8], 2)
        ent.append(b)
        if b == 0xFF:
            ent.append(0x00)
    out += ent
    out += b"\xff\xd9"
    return bytes(out)


# 1-bit DC code "0" → category 0 (flat block); 1-bit AC code "0" → the
# caller-chosen run/size symbol
_ONE_DC = ([1] + [0] * 15, b"\x00")


def test_baseline_scan_valid_and_truncated_entropy():
    from real_time_data_anomaly_detection_spark.operators.multimodal import (
        _jpeg_gray_pixels,
    )

    # DC cat 0 + EOB: a flat-128 block
    payload = _tiny_jpeg(*_ONE_DC, [1] + [0] * 15, b"\x00", "00")
    plane = _jpeg_gray_pixels(payload)
    assert plane is not None and plane.shape == (8, 8)
    assert float(plane.min()) == float(plane.max()) == 128.0
    # strip the entropy byte entirely (SOS marker 2 + segment 8): the
    # DC code itself needs padding bits → abort, like
    # _JpegBits.read_huff's EOFError
    sos = payload.index(b"\xff\xda")
    truncated = payload[: sos + 10] + b"\xff\xd9"
    assert _jpeg_gray_pixels(truncated) is None


def test_baseline_scan_invalid_code_returns_none():
    from real_time_data_anomaly_detection_spark.operators.multimodal import (
        _jpeg_gray_pixels,
    )

    # the only DC code is "0"; entropy starts with a 1 bit → no table
    # entry prefixes the window (ValueError in the _JpegBits reader)
    payload = _tiny_jpeg(*_ONE_DC, [1] + [0] * 15, b"\x00", "11111111")
    assert _jpeg_gray_pixels(payload) is None


def test_baseline_scan_run_past_slot_63_returns_none():
    from real_time_data_anomaly_detection_spark.operators.multimodal import (
        _jpeg_gray_pixels,
    )

    # AC code "0" → symbol 0xF1 (run 15, size 1): each occurrence
    # consumes 16 slots; the fourth passes slot 63 → None, exactly the
    # pre-rework k > 63 abort
    payload = _tiny_jpeg(*_ONE_DC, [1] + [0] * 15, b"\xf1", "0" + "01" * 4)
    assert _jpeg_gray_pixels(payload) is None
