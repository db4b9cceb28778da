"""Crash-freedom + property fuzz for the round-5 surgery surfaces: the
extractor's <a>-clone open-elements emulation and the stdlib PNG codec."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from grawler_ray.functions.png import PngError, decode_png, encode_png, resize_box
from grawler_ray.htmlparse import extract_html

# -- extractor: arbitrary tag soup never crashes, outputs stay typed -------

_TAGS = ["a", "div", "p", "b", "i", "span", "table", "tr", "td", "ul", "li",
         "title", "script", "svg", "caption", "dd", "dt", "h1", "form"]


@st.composite
def tag_soup(draw):
    n = draw(st.integers(0, 40))
    parts = []
    for _ in range(n):
        kind = draw(st.integers(0, 3))
        tag = draw(st.sampled_from(_TAGS))
        if kind == 0:
            href = draw(st.text(alphabet="abz/:%.?=&#", max_size=8))
            parts.append(f'<{tag} href="{href}">' if tag == "a" else f"<{tag}>")
        elif kind == 1:
            parts.append(f"</{tag}>")
        elif kind == 2:
            parts.append(draw(st.text(max_size=12)))
        else:
            parts.append(f"<{tag}/>")
    return "".join(parts)


@given(tag_soup())
@settings(max_examples=300, deadline=None)
def test_extract_html_never_crashes_on_soup(html):
    text, hrefs, meta = extract_html(html)
    assert isinstance(text, str)
    assert all(isinstance(h, str) for h in hrefs)
    assert isinstance(meta, dict)


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_extract_html_never_crashes_on_text(s):
    text, hrefs, meta = extract_html(s)
    assert isinstance(text, str)


# -- PNG: random bytes never crash; valid images roundtrip ------------------

@given(st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_decode_png_random_bytes_raise_pngerror(data):
    try:
        decode_png(data)
    except PngError:
        pass  # the only acceptable failure mode


@given(
    st.integers(1, 12), st.integers(1, 12),
    st.sampled_from([1, 2, 3, 4]), st.integers(0, 4),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=150, deadline=None)
def test_png_roundtrip_property(h, w, ch, ft, seed):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, (h, w, ch)).astype(np.uint8)
    if ch == 1:
        a = a[:, :, 0]
    out = decode_png(encode_png(a, filter_type=ft))
    assert out.shape == a.shape
    assert (out == a).all()


@given(
    st.integers(1, 10), st.integers(1, 10),
    st.integers(1, 10), st.integers(1, 10),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=150, deadline=None)
def test_resize_box_bounds_property(H, W, h, w, seed):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, (H, W, 3)).astype(np.uint8)
    out = resize_box(a, w, h)
    assert out.shape == (h, w, 3)
    # box means stay inside the source value range
    assert out.min() >= a.min() and out.max() <= a.max()


# -- JPEG: random bytes never crash; smooth images roundtrip ---------------

from grawler_ray.functions.jpeg import JpegError, decode_jpeg, encode_jpeg


@given(st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_decode_jpeg_random_bytes_raise_jpegerror(data):
    try:
        decode_jpeg(data)
    except JpegError:
        pass  # the only acceptable failure mode


@given(
    st.integers(1, 20), st.integers(1, 20),
    st.sampled_from(["gray", "rgb", "rgb420"]),
    st.integers(0, 3), st.integers(0, 2**31 - 1),
)
@settings(max_examples=100, deadline=None)
def test_jpeg_roundtrip_smooth_property(h, w, mode, ri, seed):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 200)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    plane = ((base + yy * 2 + xx) % 220).astype(np.uint8)
    a = plane if mode == "gray" else np.stack([plane] * 3, -1)
    out = decode_jpeg(
        encode_jpeg(a, quality=92, subsample=(mode == "rgb420"), restart_interval=ri)
    )
    assert out.shape == a.shape
    assert np.abs(out.astype(int) - a.astype(int)).max() <= 16


# -- GIF: random bytes never crash; exact-palette roundtrip -----------------

from grawler_ray.functions.gif import GifError, decode_gif, encode_gif


@given(st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_decode_gif_random_bytes_raise_giferror(data):
    try:
        decode_gif(data)
    except GifError:
        pass  # the only acceptable failure mode


@given(
    st.integers(1, 16), st.integers(1, 16), st.integers(1, 4),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=100, deadline=None)
def test_gif_roundtrip_property(h, w, nf, seed):
    rng = np.random.RandomState(seed)
    frames = [
        (rng.randint(0, 6, (h, w, 3)) * 42).astype(np.uint8) for _ in range(nf)
    ]
    out = decode_gif(encode_gif(frames))
    assert len(out) == nf
    for f, o in zip(frames, out):
        assert (o["image"] == f).all()


# -- WAV: random bytes never crash ------------------------------------------

from grawler_ray.functions.wav import WavError, decode_wav


@given(st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_decode_wav_random_bytes_raise_waverror(data):
    try:
        decode_wav(data)
    except WavError:
        pass  # the only acceptable failure mode


# -- truncations of VALID streams: the class random bytes never reach ------

@given(st.integers(0, 2**31 - 1), st.floats(0.01, 0.99))
@settings(max_examples=120, deadline=None)
def test_truncated_valid_streams_raise_typed_errors(seed, frac):
    from grawler_ray.stages.multimodal import synth_gif, synth_pixels, synth_wav

    rng = np.random.RandomState(seed)
    doc = int(rng.randint(0, 10_000))
    px = synth_pixels(doc)
    px3 = px[:, :, :3] if px.ndim == 3 else px
    streams = [
        (encode_png(px), PngError, decode_png),
        (encode_jpeg(px3, quality=90), JpegError, decode_jpeg),
        (synth_gif(doc), GifError, decode_gif),
        (synth_wav(doc), __import__("grawler_ray.functions.wav", fromlist=["WavError"]).WavError,
         __import__("grawler_ray.functions.wav", fromlist=["decode_wav"]).decode_wav),
    ]
    for data, err, dec in streams:
        cut = max(1, int(len(data) * frac))
        try:
            dec(data[:cut])
        except err:
            pass  # typed error is the only acceptable failure
        # a successful decode of a long-enough prefix is also fine


# -- AVI + compressed WAV (round-5 session-2 codecs) ------------------------

from grawler_ray.functions.avi import AviError, decode_avi


@given(st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_decode_avi_random_bytes_raise_avierror(data):
    try:
        decode_avi(data)
    except AviError:
        pass  # the only acceptable failure mode


@given(st.integers(0, 2**31 - 1), st.floats(0.01, 0.99))
@settings(max_examples=60, deadline=None)
def test_truncated_avi_and_compressed_wav_raise_typed_errors(seed, frac):
    from grawler_ray.stages.multimodal import synth_avi, synth_mixed_wav

    rng = np.random.RandomState(seed)
    doc = int(rng.randint(0, 10_000))
    streams = [
        (synth_avi(doc), AviError, decode_avi),
        (synth_mixed_wav(doc), WavError, decode_wav),
    ]
    for data, err, dec in streams:
        cut = max(1, int(len(data) * frac))
        try:
            dec(data[:cut])
        except err:
            pass  # typed error is the only acceptable failure


def test_g711_code_fixpoint():
    """encode(decode(code)) == code for every G.711 code — except u-law
    0x7F (negative zero), which re-encodes as positive zero 0xFF; both
    decode to the same linear 0 (the classic two-zeros artifact, same as
    audioop)."""
    from grawler_ray.functions.wav import (
        _ALAW_DEC,
        _ULAW_DEC,
        alaw_encode,
        ulaw_encode,
    )

    codes = np.arange(256)
    ue = ulaw_encode(_ULAW_DEC)
    assert np.array_equal(ue[codes != 0x7F], codes[codes != 0x7F])
    assert ue[0x7F] == 0xFF and _ULAW_DEC[0x7F] == _ULAW_DEC[0xFF] == 0
    assert np.array_equal(alaw_encode(_ALAW_DEC), codes)


@given(st.integers(0, 2**31 - 1), st.integers(1, 2))
@settings(max_examples=40, deadline=None)
def test_adpcm_random_blocks_decode_in_bounds(seed, ch):
    """Arbitrary block bytes are VALID ADPCM (every nibble decodes) —
    the vectorized decoder must accept them, keep int16 range, and be
    deterministic; encode(x) then decode stays within the worst-case
    step envelope of the source."""
    from grawler_ray.functions.wav import ima_decode_blocks, ima_encode_blocks

    rng = np.random.RandomState(seed)
    align = 64 * ch
    raw = rng.bytes(align * int(rng.randint(1, 5)))
    dec = ima_decode_blocks(raw, ch, align)
    assert dec.dtype == np.int16 and dec.shape[1] == ch
    assert np.array_equal(dec, ima_decode_blocks(raw, ch, align))
    # smooth signals roundtrip within a loose quantization envelope
    n = int(rng.randint(50, 1500))
    x = np.cumsum(rng.randint(-300, 300, size=(n, ch)), axis=0).clip(-30000, 30000)
    x = x.astype(np.int16)
    dec2 = ima_decode_blocks(ima_encode_blocks(x, align), ch, align)[:n]
    assert np.abs(dec2.astype(int) - x.astype(int)).max() <= 4096
