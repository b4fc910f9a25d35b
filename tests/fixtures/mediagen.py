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


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "tiny.png"), "wb") as f:
        f.write(write_png_all_filters(known_pixels()))
    with open(os.path.join(here, "tiny.wav"), "wb") as f:
        f.write(write_wav(known_samples()))
    print("wrote tiny.png / tiny.wav")


if __name__ == "__main__":
    main()
