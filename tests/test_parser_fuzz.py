"""Property-based fuzzing of the pure-stdlib binary parsers: on ANY
byte string they must return None or a well-formed tuple — never raise
(one corrupt payload must not kill a 100 TB scan) — and structured
mutations of VALID payloads must keep that guarantee."""

import struct
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from postgresql_topn_spark.operators.multimodal import (
    decode_png_pixels,
    parse_image_header,
    parse_netpbm,
    parse_wav_meta,
    synth_png,
    synth_wav_pcm16,
)


def _well_formed_pixels(res):
    assert res is None or (
        len(res) == 4
        and res[0] >= 1
        and res[1] >= 1
        and res[2] in (1, 2, 3, 4)
        and len(res[3]) == res[0] * res[1] * res[2]
        and all(0 <= v <= 255 for v in res[3])
    )


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_parsers_never_raise_on_random_bytes(buf):
    parse_image_header(buf)
    _well_formed_pixels(parse_netpbm(buf))
    _well_formed_pixels(decode_png_pixels(buf))
    parse_wav_meta(buf)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.binary(max_size=64),
    st.integers(min_value=0, max_value=500),
)
def test_corrupted_valid_png_never_raises(doc_id, garbage, cut):
    """Truncations, tail garbage and mid-stream splices of a REAL PNG
    must decode or return None — never raise."""
    buf = synth_png(doc_id)
    for mutated in (
        buf[: min(cut, len(buf))],
        buf + garbage,
        buf[: min(cut, len(buf))] + garbage + buf[min(cut, len(buf)) :],
    ):
        _well_formed_pixels(decode_png_pixels(mutated))
    # untouched payload still round-trips exactly
    w, h, c, px = decode_png_pixels(buf)
    m = 8 + doc_id % 9
    assert px[:4] == [((i % m) * 37 + doc_id * 31) % 256 for i in range(4)]


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.binary(max_size=64),
    st.integers(min_value=0, max_value=2000),
)
def test_corrupted_valid_wav_never_raises(doc_id, garbage, cut):
    buf = synth_wav_pcm16(doc_id)
    for mutated in (
        buf[: min(cut, len(buf))],
        buf + garbage,
        bytes([b ^ 0xFF for b in buf[:12]]) + buf[12:],
    ):
        res = parse_wav_meta(mutated)
        assert res is None or len(res) == 4


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.sampled_from([0, 2, 4, 6]),
    st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=9),
    st.data(),
)
def test_random_filtered_png_round_trips(w, h, ctype, filters, data):
    """Random pixels + RANDOM PER-ROW FILTER TYPES: encode by hand
    (applying each filter's forward transform), decode must recover the
    exact pixels — the unfilter paths beat a reference encoder on every
    combination, not just the synth_png filter-0 case."""
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    stride = w * channels
    filters = (filters * h)[:h]
    pixels = [
        [data.draw(st.integers(min_value=0, max_value=255)) for _ in range(stride)]
        for _ in range(h)
    ]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    bpp = channels
    raw = bytearray()
    prev = [0] * stride
    for y, f in enumerate(filters):
        cur = pixels[y]
        if f == 0:
            enc = cur[:]
        elif f == 1:
            enc = [(cur[x] - (cur[x - bpp] if x >= bpp else 0)) & 0xFF
                   for x in range(stride)]
        elif f == 2:
            enc = [(cur[x] - prev[x]) & 0xFF for x in range(stride)]
        elif f == 3:
            enc = [(cur[x] - (((cur[x - bpp] if x >= bpp else 0) + prev[x]) >> 1)) & 0xFF
                   for x in range(stride)]
        else:
            enc = [(cur[x] - paeth(cur[x - bpp] if x >= bpp else 0,
                                   prev[x],
                                   prev[x - bpp] if x >= bpp else 0)) & 0xFF
                   for x in range(stride)]
        raw.append(f)
        raw.extend(enc)
        prev = cur

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    got = decode_png_pixels(png)
    assert got == (w, h, channels, [v for row in pixels for v in row])


@settings(max_examples=150, deadline=None)
@given(
    st.sampled_from([b"P2", b"P3", b"P5", b"P6"]),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=65535),
    st.binary(max_size=120),
)
def test_netpbm_hostile_body_never_raises_or_escapes_range(
    kind, w, h, maxval, body
):
    """VALID NetPBM header + ARBITRARY sample body: the decoder must
    return None or in-range pixels — never raise, never emit a value
    outside 0..255. Random-bytes fuzzing almost never forms a valid
    header, so the r12 review found two escapes this structured
    strategy now pins: ASCII int() raising on a non-decimal token, and
    samples above the declared maxval scaling far past 255."""
    buf = kind + b" %d %d %d " % (w, h, maxval) + body
    _well_formed_pixels(parse_netpbm(buf))


def test_netpbm_lying_samples_clamp_and_bad_tokens_reject():
    """Deterministic pins for the two r12 parse_netpbm fixes."""
    # ASCII token above maxval clamps to maxval before scaling
    assert parse_netpbm(b"P2 1 1 255 999") == (1, 1, 1, [255])
    # 8-bit binary sample above a small maxval clamps (was 9289)
    assert parse_netpbm(b"P5 1 1 7 \xff") == (1, 1, 1, [255])
    # 16-bit big-endian sample above maxval clamps (was 55704)
    assert parse_netpbm(b"P5 1 1 300 \xff\xff") == (1, 1, 1, [255])
    # scaling still exact for legal samples: 3 of maxval 7 -> 109
    assert parse_netpbm(b"P2 1 1 7 3") == (1, 1, 1, [3 * 255 // 7])
    # non-decimal ASCII sample tokens -> None, never ValueError
    assert parse_netpbm(b"P2 1 1 255 abc") is None
    assert parse_netpbm(b"P3 2 1 255 1 2 3 x 5 6") is None
    assert parse_netpbm(b"P2 1 1 255 -3") is None
