"""Pure-Python RIFF/AVI video container (grayscale DIB + MJPG frames).

Makes ``video/avi`` a REAL media type next to ``image/png``,
``image/jpeg`` and ``audio/wav``: the multimodal pipelines carry video as
opaque binary payloads, and this module reads/writes actual AVI files
in-sandbox without ffmpeg.

Scope:
- writer: ``avi_encode(frames, fps, codec)`` for (n, H, W) uint8
  grayscale frame stacks. ``codec="DIB "`` stores uncompressed 8-bit
  palettized bottom-up DIBs with 4-byte row stride — LOSSLESS, so
  integer frame checksums (and their DuckDB oracles) survive the
  container roundtrip bit-for-bit. ``codec="MJPG"`` stores one baseline
  JFIF stream per frame via :mod:`stages.jpeg` (lossy; tests pin the
  decode to exact equality with the bare JPEG roundtrip instead).
- reader: ``avi_decode(data)`` walks the RIFF chunk tree (hdrl / strl /
  movi / idx1, LIST recursion, odd-size padding), takes the first
  ``vids`` stream, and decodes ``00db``/``00dc`` frame chunks per the
  stream's BITMAPINFOHEADER compression: BI_RGB 8-bit palettized DIB or
  MJPG. Other codecs (H.264 etc. — genuinely need native libraries)
  raise ``ValueError`` so actor-pool stages quarantine the row per
  SURVEY.md M11.

Reference behavior target: the reference treats media as opaque files on
disk (render_text.py:48-61 reads image files; no video path exists) —
video support here is part of the beyond-reference multimodal surface
the engine adds for large-scale training-data pipelines.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import jpeg_decode, jpeg_encode

_MJPG = b"MJPG"
_DIB = b"DIB "


def _chunk(ckid: bytes, payload: bytes) -> bytes:
    out = ckid + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"  # RIFF chunks are word-aligned
    return out


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def _dib_frame(frame: np.ndarray) -> bytes:
    """8-bit palettized BI_RGB DIB pixel data: bottom-up rows, stride
    padded to a 4-byte boundary."""
    h, w = frame.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = frame[::-1]  # bottom-up
    return rows.tobytes()


def avi_encode(
    frames: np.ndarray,
    fps: int = 25,
    codec: str = "DIB ",
    quality: int = 85,
) -> bytes:
    """Encode an (n, H, W) uint8 grayscale frame stack to an AVI file."""
    arr = np.asarray(frames)
    if arr.dtype != np.uint8 or arr.ndim != 3 or 0 in arr.shape:
        raise ValueError("expected non-empty (n, H, W) uint8 frames")
    if fps <= 0:
        raise ValueError("fps must be positive")
    fourcc = codec.encode("ascii") if isinstance(codec, str) else codec
    if fourcc not in (_DIB, _MJPG):
        raise ValueError(f"unsupported codec {codec!r}")
    n, h, w = arr.shape

    if fourcc == _DIB:
        payloads = [_dib_frame(f) for f in arr]
        ckid = b"00db"
        # BITMAPINFOHEADER + 256-entry grayscale BGR0 palette
        stride = (w + 3) & ~3
        bmih = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8, 0, stride * h, 0, 0, 256, 0
        )
        palette = bytes(
            b for i in range(256) for b in (i, i, i, 0)
        )
        strf = bmih + palette
        handler = b"\x00\x00\x00\x00"
        bitcount_note = 8
    else:
        payloads = [jpeg_encode(f, quality=quality) for f in arr]
        ckid = b"00dc"
        bmih = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, struct.unpack("<I", _MJPG)[0],
            0, 0, 0, 0, 0,
        )
        strf = bmih
        handler = _MJPG
    max_sz = max(len(p) for p in payloads)

    avih = struct.pack(
        "<14I",
        round(1_000_000 / fps),  # dwMicroSecPerFrame
        0,                       # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        n, 0, 1, max_sz,         # frames, initial, streams, sugg. buffer
        w, h, 0, 0, 0, 0,        # width, height, reserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", handler, 0, 0, 0, 0,
        1, int(fps), 0, n, max_sz,
        0xFFFFFFFF, 0,           # dwQuality, dwSampleSize
        0, 0, w, h,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = bytearray()
    index = bytearray()
    for p in payloads:
        # idx1 offsets point at the chunk id, relative to the position of
        # the 'movi' fourcc (the de-facto convention)
        off = 4 + len(movi_payload)
        movi_payload += _chunk(ckid, p)
        index += ckid + struct.pack("<III", 0x10, off, len(p))
    movi = _list(b"movi", bytes(movi_payload))
    idx1 = _chunk(b"idx1", bytes(index))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def avi_decode(data: bytes) -> tuple[np.ndarray, float]:
    """Decode AVI bytes → ((n, H, W) uint8 grayscale frames, fps)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI stream (missing RIFF/AVI header)")
    (riff_sz,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_sz, len(data))

    state = {"avih": None, "strh": None, "strf": None, "in_vids": False}
    frames_raw: list[tuple[bytes, bytes]] = []

    def walk(p: int, stop: int) -> None:
        while p + 8 <= stop:
            ckid = data[p : p + 4]
            (sz,) = struct.unpack_from("<I", data, p + 4)
            body, bend = p + 8, p + 8 + sz
            if bend > stop:
                raise ValueError("truncated AVI chunk")
            if ckid == b"LIST":
                walk(body + 4, bend)
            elif ckid == b"avih":
                state["avih"] = data[body:bend]
            elif ckid == b"strh":
                state["in_vids"] = data[body : body + 4] == b"vids"
                if state["in_vids"] and state["strh"] is None:
                    state["strh"] = data[body:bend]
            elif ckid == b"strf":
                if state["in_vids"] and state["strf"] is None:
                    state["strf"] = data[body:bend]
                state["in_vids"] = False
            elif ckid[:2] == b"00" and ckid[2:4] in (b"db", b"dc"):
                frames_raw.append((ckid[2:4], data[body:bend]))
            p = bend + (sz & 1)

    walk(12, end)
    strf = state["strf"]
    if strf is None or len(strf) < 40:
        raise ValueError("missing vids stream format")
    (
        _bisz, bw, bh, _planes, bitcount, compression, _szimg,
        _xp, _yp, clr_used, _clr_imp,
    ) = struct.unpack_from("<IiiHHIIiiII", strf, 0)
    if bh < 0:  # negative height = top-down DIB
        bh, topdown = -bh, True
    else:
        topdown = False
    if bw <= 0 or bh <= 0:
        raise ValueError("bad frame dimensions")

    # fps: prefer strh dwRate/dwScale, fall back to avih microsec/frame
    fps = 0.0
    strh = state["strh"]
    if strh is not None and len(strh) >= 56:
        scale, rate = struct.unpack_from("<II", strh, 20)
        if scale and rate:
            fps = rate / scale
    if not fps and state["avih"] is not None:
        (uspf,) = struct.unpack_from("<I", state["avih"], 0)
        if uspf:
            fps = 1_000_000 / uspf

    frames: list[np.ndarray] = []
    if compression == 0:  # BI_RGB uncompressed DIB
        if bitcount != 8:
            raise ValueError(f"only 8-bit uncompressed DIB supported, got {bitcount}")
        ncolors = clr_used or 256
        pal = np.frombuffer(strf, dtype=np.uint8, count=ncolors * 4, offset=40)
        pal = pal.reshape(ncolors, 4)
        if not (pal[:, 0] == pal[:, 1]).all() or not (pal[:, 1] == pal[:, 2]).all():
            raise ValueError("non-grayscale DIB palette unsupported")
        lut = np.zeros(256, dtype=np.uint8)
        lut[:ncolors] = pal[:, 0]
        stride = (bw + 3) & ~3
        for _kind, raw in frames_raw:
            if len(raw) < stride * bh:
                raise ValueError("truncated DIB frame")
            rows = np.frombuffer(raw, dtype=np.uint8, count=stride * bh)
            img = lut[rows.reshape(bh, stride)[:, :bw]]
            frames.append(img if topdown else img[::-1])
    elif struct.pack("<I", compression) == _MJPG:
        for _kind, raw in frames_raw:
            img = jpeg_decode(bytes(raw))
            if img.ndim == 3:  # luma-convert color MJPG frames
                img = np.clip(
                    np.round(
                        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
                    ),
                    0,
                    255,
                ).astype(np.uint8)
            if img.shape != (bh, bw):
                raise ValueError("MJPG frame dims disagree with stream header")
            frames.append(img)
    else:
        four = struct.pack("<I", compression)
        raise ValueError(f"unsupported AVI codec {four!r}")
    if not frames:
        raise ValueError("no video frames")
    return np.stack(frames), fps
