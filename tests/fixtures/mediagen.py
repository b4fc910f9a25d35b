"""Media fixture generator (VERDICT r9 item 4) — independent of the
production codecs on purpose: this module FORWARD-filters PNG
scanlines (spec §6.6, one row per filter type 0–4), while
``operators/codecs.py`` implements the INVERSE transforms, so decoding
these bytes back to ``known_pixels()`` is a real inverse-function test
rather than a self-referential round-trip. The WAV side uses the
stdlib ``wave`` writer with a closed-form int16 waveform.

Run as a script to (re)write ``tiny.png`` / ``tiny.wav`` next to it.
"""

from __future__ import annotations

import io
import os
import struct
import wave
import zlib

import numpy as np

W, H = 6, 5  # 5 rows: one per PNG filter type


def known_pixels() -> np.ndarray:
    """Closed-form RGB test image: every channel a distinct ramp, so a
    single mis-unfiltered byte shifts many recovered values."""
    y, x = np.mgrid[0:H, 0:W]
    r = (x * 40 + y * 7) % 256
    g = (x * 11 + y * 53) % 256
    b = (255 - x * 29 + y * 17) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def _filter_row(ftype: int, cur: np.ndarray, prev: np.ndarray, ch: int) -> bytes:
    """Forward PNG filtering of one raw scanline (spec §6.6)."""
    n = len(cur)
    out = np.empty(n, dtype=np.uint8)
    for i in range(n):
        a = int(cur[i - ch]) if i >= ch else 0  # left
        b = int(prev[i])  # up
        c = int(prev[i - ch]) if i >= ch else 0  # up-left
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        else:
            raise ValueError(ftype)
        out[i] = (int(cur[i]) - pred) & 0xFF
    return bytes([ftype]) + out.tobytes()


def write_png_all_filters(pixels: np.ndarray) -> bytes:
    """PNG bytes using filter type y%5 for scanline y — exercises every
    inverse filter in the production decoder."""
    h, w, ch = pixels.shape
    flat = pixels.reshape(h, w * ch)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        raw += _filter_row(y % 5, flat[y], prev, ch)
        prev = flat[y]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + chunk(b"IEND", b"")
    )


WAV_RATE = 4000
WAV_MS = 2500  # 2.5 s -> three 2000ms/1000ms-hop windows (0-2000, 1000-2500, 2000-2500)


def known_samples() -> np.ndarray:
    """Closed-form int16 mono waveform: a ramp with a sign flip, so any
    slicing off-by-one changes window content detectably."""
    n = WAV_RATE * WAV_MS // 1000
    t = np.arange(n)
    return (((t * 13) % 2048 - 1024) * np.where(t % 2 == 0, 1, -1)).astype(np.int16)[:, None]


def write_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


AVI_W, AVI_H = 6, 5  # odd width -> 8-byte stride exercises row padding
AVI_FPS = 2
AVI_FRAMES = 5  # 2.5 s -> frame_at_ms must seek past frame 0


def known_frames() -> np.ndarray:
    """Closed-form grayscale frames: each frame a distinct affine ramp,
    so a swapped frame order, missed row flip, or stride off-by-one
    shifts many recovered bytes."""
    f, y, x = np.mgrid[0:AVI_FRAMES, 0:AVI_H, 0:AVI_W]
    return ((f * 59 + y * 17 + x * 5) % 256).astype(np.uint8)


def write_avi(frames: np.ndarray, fps: int = AVI_FPS) -> bytes:
    """Independent uncompressed-AVI writer (the production decoder's
    inverse lives in ``operators/codecs.py``): assembles the RIFF tree
    with explicit per-field packing and writes rows bottom-up, padding
    each to the 4-byte DIB stride — decoding these bytes back to
    ``known_frames()`` tests the parser, not a self-round-trip."""
    n, h, w = frames.shape
    stride = (w + 3) // 4 * 4
    dibs = []
    for f in range(n):
        rows = b""
        for y in range(h - 1, -1, -1):  # bottom-up
            rows += frames[f, y].tobytes() + bytes(stride - w)
        dibs.append(rows)

    def ck(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + len(body).to_bytes(4, "little") + body + pad

    avih = b"".join(
        v.to_bytes(4, "little")
        for v in (1_000_000 // fps, stride * h * fps, 0, 0x10, n, 0, 1,
                  stride * h, w, h, 0, 0, 0, 0)
    )
    strh = (
        b"vids" + b"DIB "
        + b"".join(v.to_bytes(4, "little") for v in (0, 0, 0, 1, fps, 0, n,
                                                     stride * h, 0xFFFFFFFF, 0))
        + (0).to_bytes(4, "little")  # rcFrame left/top
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    )
    strf = (
        b"".join(v.to_bytes(4, "little") for v in (40,)) +
        w.to_bytes(4, "little", signed=True) + h.to_bytes(4, "little", signed=True) +
        (1).to_bytes(2, "little") + (8).to_bytes(2, "little") +
        b"".join(v.to_bytes(4, "little") for v in (0, stride * h, 0, 0, 256, 0)) +
        b"".join(bytes((g, g, g, 0)) for g in range(256))
    )
    hdrl = ck(b"LIST", b"hdrl" + ck(b"avih", avih)
              + ck(b"LIST", b"strl" + ck(b"strh", strh) + ck(b"strf", strf)))
    movi_body = b"movi"
    idx = b""
    for d in dibs:
        idx += b"00db" + (0x10).to_bytes(4, "little") \
            + len(movi_body).to_bytes(4, "little") + len(d).to_bytes(4, "little")
    for d in dibs:
        movi_body += ck(b"00db", d)
    payload = b"AVI " + hdrl + ck(b"LIST", movi_body) + ck(b"idx1", idx)
    return b"RIFF" + len(payload).to_bytes(4, "little") + payload


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "tiny.png"), "wb") as f:
        f.write(write_png_all_filters(known_pixels()))
    with open(os.path.join(here, "tiny.wav"), "wb") as f:
        f.write(write_wav(known_samples()))
    with open(os.path.join(here, "tiny.avi"), "wb") as f:
        f.write(write_avi(known_frames()))
    print("wrote tiny.png / tiny.wav / tiny.avi")


if __name__ == "__main__":
    main()
