import numpy as np
import pytest

from web_scrapper_ray import codecs


def _rand_img(seed, h, w):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(16, 16), (32, 48), (33, 17), (64, 64)])
def test_png_roundtrip_exact(h, w):
    img = _rand_img(h * 100 + w, h, w)
    data = codecs.png_encode(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = codecs.png_decode(data)
    assert np.array_equal(out, img)


def test_png_decode_filters():
    # Exercise the unfiltering paths by hand-building filtered scanlines.
    import struct
    import zlib

    img = _rand_img(7, 8, 8)
    h, w = img.shape[:2]
    rows = []
    for y, f in zip(range(h), [0, 1, 2, 3, 4, 0, 2, 1]):
        line = img[y].reshape(-1).astype(np.int32)
        prev = img[y - 1].reshape(-1).astype(np.int32) if y else np.zeros(w * 3, np.int32)
        if f == 0:
            enc = line
        elif f == 1:
            enc = line.copy()
            enc[3:] = (line[3:] - line[:-3]) % 256
        elif f == 2:
            enc = (line - prev) % 256
        elif f == 3:
            enc = line.copy()
            for x in range(w * 3):
                a = line[x - 3] if x >= 3 else 0
                enc[x] = (line[x] - ((a + prev[x]) >> 1)) % 256
        else:
            enc = line.copy()
            for x in range(w * 3):
                a = line[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                enc[x] = (line[x] - pred) % 256
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + codecs._chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.png_decode(data), img)


@pytest.mark.parametrize("h,w", [(16, 16), (48, 64), (33, 41)])
def test_sjpg_psnr_above_40(h, w):
    # Worst case for DCT quantization is uniform noise; must still clear 40 dB.
    img = _rand_img(h + w, h, w)
    out = codecs.sjpg_decode(codecs.sjpg_encode(img))
    assert out.shape == img.shape
    assert codecs.psnr(img, out) >= 40.0


def test_sjpg_deterministic():
    img = _rand_img(3, 32, 32)
    assert codecs.sjpg_encode(img) == codecs.sjpg_encode(img)


def test_phash_properties():
    img = _rand_img(11, 64, 64)
    p1 = codecs.phash64(img)
    assert -(2**63) <= p1 < 2**63
    # Identical image → identical hash; lossy roundtrip → small hamming dist.
    assert codecs.phash64(img.copy()) == p1
    lossy = codecs.sjpg_decode(codecs.sjpg_encode(img))
    assert codecs.hamming64(p1, codecs.phash64(lossy)) <= 6
    # A very different image → large distance.
    img2 = _rand_img(999, 64, 64)
    assert codecs.hamming64(p1, codecs.phash64(img2)) > 10


def test_decode_dispatch():
    img = _rand_img(5, 16, 16)
    assert np.array_equal(codecs.decode_image(codecs.encode_image(img, "png")), img)
    out = codecs.decode_image(codecs.encode_image(img, "jpeg"))
    assert codecs.psnr(img, out) >= 40.0


def test_png_decode_all_filter_types():
    """png_decode must reverse every PNG scanline filter a conformant
    encoder may emit (libpng adaptive filtering uses all five), not just
    our own encoder's filter-0 rows. Forward-filter a known image with
    each type per row and assert exact reconstruction."""
    import struct
    import zlib

    import numpy as np

    from web_scrapper_ray import codecs

    rng = np.random.default_rng(99)
    h, w, bpp = 11, 13, 3
    img = rng.integers(0, 256, size=(h, w, bpp), dtype=np.uint8)
    flat = img.reshape(h, w * bpp).astype(np.int32)

    def forward(y, ftype):
        line = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(w * bpp, np.int32)
        shifted = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
        prev_shift = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if ftype == 0:
            f = line
        elif ftype == 1:
            f = line - shifted
        elif ftype == 2:
            f = line - prev
        elif ftype == 3:
            f = line - ((shifted + prev) >> 1)
        else:  # Paeth
            p = shifted + prev - prev_shift
            pa = np.abs(p - shifted)
            pb = np.abs(p - prev)
            pc = np.abs(p - prev_shift)
            pred = np.where((pa <= pb) & (pa <= pc), shifted,
                            np.where(pb <= pc, prev, prev_shift))
            f = line - pred
        return (f & 0xFF).astype(np.uint8)

    raw = np.zeros((h, 1 + w * bpp), dtype=np.uint8)
    for y in range(h):
        ftype = y % 5  # cycle through every filter type
        raw[y, 0] = ftype
        raw[y, 1:] = forward(y, ftype)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(raw.tobytes(), 6)

    def chunk(tag, payload):
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF)

    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", idat) + chunk(b"IEND", b""))
    decoded = codecs.png_decode(png)
    assert np.array_equal(decoded, img)


def test_sniff_format_magic_over_extension():
    import numpy as np

    from web_scrapper_ray import codecs

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    png = codecs.encode_image(px, "png")
    jpg = codecs.encode_image(px, "jpeg")
    assert codecs.sniff_format(png, "jpeg") == "png"      # magic wins
    assert codecs.sniff_format(jpg, "PNG") == "jpeg"
    assert codecs.sniff_format(b"\xff\xd8rest", "") == "jpeg"  # real JPEG SOI
    assert codecs.sniff_format(b"????", "PNG") == "png"   # ext fallback
    assert codecs.sniff_format(b"????", "") == "jpeg"


def test_png_decode_multi_chunk_idat():
    """Real encoders emit IDAT in small chunks; the decoder must join
    them (and not pay O(n²) byte concatenation doing it)."""
    import struct
    import zlib

    import numpy as np

    from web_scrapper_ray import codecs, synth

    px = synth.image_pixels("multi-idat", 32, 24)
    blob = codecs.png_encode(px)
    # re-chunk the single IDAT into 7-byte pieces
    def chunks(data):
        pos = 8
        while pos < len(data):
            (length,) = struct.unpack(">I", data[pos:pos + 4])
            tag = data[pos + 4:pos + 8]
            yield tag, data[pos + 8:pos + 8 + length]
            pos += 12 + length

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    out = [blob[:8]]
    for tag, payload in chunks(blob):
        if tag == b"IDAT":
            for i in range(0, len(payload), 7):
                out.append(chunk(b"IDAT", payload[i:i + 7]))
        else:
            out.append(chunk(tag, payload))
    rechunked = b"".join(out)
    assert np.array_equal(codecs.png_decode(rechunked), px)


def test_dhash_brightness_invariant_and_crop_sensitive():
    """q316's stage: dHash survives a re-encode AND a non-clipping
    global brightness shift (gradient signs unchanged); a crop that
    shifts the block grid flips bits."""
    import numpy as np

    from web_scrapper_ray import codecs
    from web_scrapper_ray.stages.multimodal import DHash

    rng = np.random.default_rng(3)
    px = rng.integers(10, 200, (48, 72, 3), np.uint8)
    d0 = DHash.dhash64(px)
    # re-encode roundtrip (png is lossless)
    d1 = DHash.dhash64(codecs.decode_image(codecs.png_encode(px)))
    assert d1 == d0
    shifted = (px.astype(int) + 30).astype(np.uint8)
    assert DHash.dhash64(shifted) == d0
    cropped = px[8:, 12:]
    assert DHash.dhash64(cropped) != d0


def test_border_screen_letterbox():
    """q317's stage: a 12-row top/bottom letterbox and an 8-col
    pillarbox are measured exactly; a full-frame image reports zero
    bars and content 1.0."""
    import numpy as np
    import pyarrow as pa

    from web_scrapper_ray import codecs
    from web_scrapper_ray.stages.multimodal import BorderScreen

    rng = np.random.default_rng(5)
    img = np.zeros((64, 64, 3), np.uint8)
    img[12:52, 8:56] = rng.integers(1, 255, (40, 48, 3), np.uint8)
    full = rng.integers(1, 255, (16, 16, 3), np.uint8)
    batch = pa.table({
        "image_id": pa.array(["boxed", "full"]),
        "bytes": pa.array([codecs.png_encode(img),
                           codecs.png_encode(full)], pa.binary()),
    })
    out = BorderScreen()(batch).to_pandas().set_index("image_id")
    assert out.loc["boxed", "bar_top"] == 12
    assert out.loc["boxed", "bar_bottom"] == 12
    assert out.loc["boxed", "bar_left"] == 8
    assert out.loc["boxed", "bar_right"] == 8
    assert out.loc["boxed", "content_frac"] == round(
        40 * 48 / 4096, 6)
    assert out.loc["full", "bar_top"] == 0
    assert out.loc["full", "content_frac"] == 1.0


def test_caption_screens_via_entry(ray_session):
    """q318/q319 surface smoke: quality screen emits one row per
    crawl image with sane ranges; caption dedup returns the (empty
    on this world) boilerplate census with a stable schema."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "wsr_entry", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    q = qs["q318_caption_quality"]("/root/testdata/sf0.001")
    assert len(q) > 0
    assert (q["alpha_share"] <= 1.0).all()
    assert (q["n_words"] >= 0).all()
    d = qs["q319_caption_dedup"]("/root/testdata/sf0.001")
    assert list(d.columns) == ["caption", "n_images", "keeper"]
    assert (d["n_images"] >= 2).all()


def test_phash_threshold_sweep_planted(ray_session, tmp_path):
    """q358: a re-encode-identical twin is a true pair found at every
    threshold; a noisy non-dup widens pred_pairs only at large t."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray import codecs
    from web_scrapper_ray.pipelines.dedup import (
        q_phash_threshold_sweep)

    rng = np.random.default_rng(9)
    base = rng.integers(0, 255, (32, 32, 3), np.uint8)
    other = rng.integers(0, 255, (32, 32, 3), np.uint8)
    imgs = [("a", base), ("b", base.copy()), ("c", other)]
    pq.write_table(pa.table({
        "image_id": pa.array([i for i, _ in imgs]),
        "bytes": pa.array([codecs.png_encode(px) for _, px in imgs],
                          pa.binary()),
        "phash": pa.array([codecs.phash64(px) for _, px in imgs],
                          pa.int64()),
    }), str(tmp_path / "images.parquet"))
    out = q_phash_threshold_sweep("unused",
                                  images_dir=str(tmp_path))
    r0 = out[out["threshold"] == 0].iloc[0]
    assert r0["true_pairs"] == 1
    assert r0["tp"] == 1
    assert r0["recall"] == 1.0
    assert r0["precision"] == 1.0
