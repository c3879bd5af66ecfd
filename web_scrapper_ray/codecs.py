"""Image codecs + perceptual hash (pure numpy / stdlib).

The north-rule data model promotes the reference's image-URL strings
(`/root/reference/src/webscraper/scrapers/content.py:864-916`) to fetched
and decoded ``bytes: binary`` payloads with ``(w, h, fmt, phash)``
columns.  This container has no Pillow / libjpeg, so:

* ``png``  — a real, spec-conformant PNG codec (8-bit RGB, zlib,
  filters 0–4 on decode, filter 0 on encode).  Lossless: decode is
  bit-exact.
* ``jpeg`` — the lossy path is a deterministic DCT-quantization
  stand-in ("SJ01" container: per-channel 8×8 block DCT, fixed mild
  quant table); real libjpeg decoding is NOT wired (Pillow is absent
  here, and a deterministic codec keeps the parity suites exact — swap
  ``sjpg_*`` for Pillow calls to crawl real JPEG).  Quant steps are ≤6 so
  reconstruction PSNR ≥ 40 dB is guaranteed even for noise images
  (MSE ≤ q²/12 per coefficient), satisfying the BASELINE.json
  input_hint invariant.  The Ray-side plumbing (schema, batch sizes,
  actor signatures) is identical for both backends.
* ``phash`` — 64-bit perceptual hash: grayscale → 32×32 → 2-D DCT-II →
  top-left 8×8 coefficients → median threshold (classic pHash).

All functions operate on ``numpy`` arrays of shape (h, w, 3), dtype
uint8, and are deterministic.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG (lossless)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as an RGB8 PNG (filter 0)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("png_encode expects (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # Prefix each scanline with filter byte 0.
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters. raw is (h, 1 + w*bpp) uint8.

    Real encoders (libpng adaptive filtering) emit Sub/Up/Average/Paeth
    constantly, so the reconstruction must not be a per-BYTE Python
    loop (~6M interpreted iterations for one 1080p frame). None/Up are
    whole-row vector ops; Sub is a per-lane modular cumsum; Average and
    Paeth carry a true sequential dependency along the row, so they run
    a per-PIXEL loop with all bpp lanes vectorized (w iterations, not
    w·bpp)."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y, 0]
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            out[y] = line.astype(np.uint8)
        elif ftype == 1:  # Sub — modular prefix sum per byte lane
            out[y] = (np.cumsum(line.reshape(w, bpp), axis=0,
                                dtype=np.int64) & 0xFF).astype(
                np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            out[y] = ((line + prev) & 0xFF).astype(np.uint8)
        elif ftype == 3:  # Average
            px = line.reshape(w, bpp)
            pv = prev.reshape(w, bpp)
            cur = np.empty((w, bpp), dtype=np.int32)
            a = np.zeros(bpp, dtype=np.int32)
            for i in range(w):
                a = (px[i] + ((a + pv[i]) >> 1)) & 0xFF
                cur[i] = a
            out[y] = cur.astype(np.uint8).reshape(stride)
        elif ftype == 4:  # Paeth
            px = line.reshape(w, bpp)
            pv = prev.reshape(w, bpp)
            cur = np.empty((w, bpp), dtype=np.int32)
            a = np.zeros(bpp, dtype=np.int32)
            c = np.zeros(bpp, dtype=np.int32)
            for i in range(w):
                b = pv[i]
                p = a + b - c
                pa, pb, pc2 = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc2), a,
                                np.where(pb <= pc2, b, c))
                a = (px[i] + pred) & 0xFF
                cur[i] = a
                c = b
            out[y] = cur.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode an RGB8 PNG produced by any conformant encoder."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h = 8, 0, 0
    idat: list[bytes] = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB PNGs supported")
            if len(payload) >= 13 and payload[12] != 0:
                raise ValueError("interlaced (Adam7) PNG unsupported")
        elif tag == b"IDAT":
            idat.append(payload)  # join once — += is O(n²) over the
            # ~8 KB chunks real encoders emit
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(b"".join(idat)),
                        dtype=np.uint8).reshape(h, w * 3 + 1)
    return _unfilter(raw, h, w, 3).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Lossy "jpeg" stand-in (deterministic DCT quantization, SJ01 container)
# ---------------------------------------------------------------------------

_SJ_MAGIC = b"SJ01"

# Mild quant table: steps 2..6 → per-coefficient MSE ≤ 6²/12 = 3 →
# worst-case PSNR ≈ 10·log10(255²/3) ≈ 43.4 dB, above the 40 dB gate.
_QUANT = (2.0 + 4.0 * (np.add.outer(np.arange(8), np.arange(8)) / 14.0)).round()


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0, :] = np.sqrt(1.0 / n)
    return m


_D8 = _dct_matrix(8)
_D32 = _dct_matrix(32)


def _blockify(chan: np.ndarray) -> np.ndarray:
    """(H, W) → (H//8, W//8, 8, 8), padding to multiples of 8 by edge-replication."""
    h, w = chan.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        chan = np.pad(chan, ((0, ph), (0, pw)), mode="edge")
    hh, ww = chan.shape
    return chan.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)


def _unblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    nh, nw = blocks.shape[:2]
    return blocks.transpose(0, 2, 1, 3).reshape(nh * 8, nw * 8)[:h, :w]


def sjpg_encode(pixels: np.ndarray, quality: int = 85) -> bytes:
    """Deterministic lossy encode (DCT + fixed quant + zlib)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("sjpg_encode expects (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    chans = []
    for c in range(3):
        blocks = _blockify(pixels[:, :, c].astype(np.float64) - 128.0)
        coef = np.einsum("ij,abjk,lk->abil", _D8, blocks, _D8)
        q = np.round(coef / _QUANT).astype(np.int16)
        chans.append(q)
    payload = zlib.compress(np.stack(chans).tobytes(), 6)
    return _SJ_MAGIC + struct.pack(">IIB", w, h, quality) + payload


def sjpg_decode(data: bytes) -> np.ndarray:
    if data[:4] != _SJ_MAGIC:
        raise ValueError("not an SJ01 payload")
    w, h, _q = struct.unpack(">IIB", data[4:13])
    nh, nw = (h + 7) // 8, (w + 7) // 8
    q = np.frombuffer(zlib.decompress(data[13:]), dtype=np.int16).reshape(3, nh, nw, 8, 8)
    out = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        coef = q[c].astype(np.float64) * _QUANT
        blocks = np.einsum("ji,abjk,kl->abil", _D8, coef, _D8)
        out[:, :, c] = np.clip(np.rint(_unblockify(blocks, h, w) + 128.0), 0, 255).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# Dispatch by fmt column value
# ---------------------------------------------------------------------------


def sniff_format(data: bytes, ext_hint: str = "") -> str:
    """Container format from magic bytes — the URL extension lies about
    case ('photo.PNG'), query strings ('photo?v=2') and renamed files;
    it is consulted only when no known magic matches."""
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:4] == _SJ_MAGIC or data[:2] == b"\xff\xd8":
        return "jpeg"
    return "png" if ext_hint.lower() == "png" else "jpeg"


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(pixels)
    if fmt == "jpeg":
        # Pillow-backed real JPEG would go here; deterministic stand-in otherwise.
        return sjpg_encode(pixels)
    raise ValueError(f"unsupported fmt {fmt!r}")


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode by sniffing magic bytes (fmt is advisory). Truncated or
    corrupt payloads always surface as ValueError — the contract the
    decode stage's skip-bad-image handling relies on (struct/zlib
    errors from partial HTTP reads must not kill a whole task)."""
    try:
        if data[:8] == _PNG_SIG:
            return png_decode(data)
        if data[:4] == _SJ_MAGIC:
            return sjpg_decode(data)
    except ValueError:
        raise
    except Exception as e:  # struct.error, zlib.error, reshape, ...
        raise ValueError(f"corrupt image payload: {type(e).__name__}: {e}") from e
    raise ValueError("unrecognised image payload")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# ---------------------------------------------------------------------------
# Perceptual hash
# ---------------------------------------------------------------------------


def phash64(pixels: np.ndarray) -> int:
    """Classic 64-bit pHash (8×8 low-frequency DCT, median threshold).

    Returns a signed int64 (two's complement of the 64-bit hash) to fit
    the ``phash:int64`` column of the BASELINE.json input_hint schema.
    """
    gray = (
        0.299 * pixels[:, :, 0] + 0.587 * pixels[:, :, 1] + 0.114 * pixels[:, :, 2]
    ).astype(np.float64)
    h, w = gray.shape
    ys = (np.arange(32) * h // 32).astype(np.int64)
    xs = (np.arange(32) * w // 32).astype(np.int64)
    small = gray[np.ix_(ys, xs)]
    coef = _D32 @ small @ _D32.T
    block = coef[:8, :8].flatten()
    med = np.median(block)
    bits = block > med
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def phash64_batch(payloads: list[bytes]) -> np.ndarray:
    """Vectorized-enough helper for map_batches decode stages."""
    return np.array([phash64(decode_image(p)) for p in payloads], dtype=np.int64)


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1"))
