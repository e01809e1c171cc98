"""Optional NATIVE decode tier for the multimodal stages.

A tiny C shim over the *system* libjpeg / libpng (present in this container
as ``libjpeg.so.62`` / ``libpng16.so.16``) is compiled on first use with the
system C compiler and loaded via ctypes.  This is the 100-TB throughput tier
the pure-python decoders (functions/jpeg.py, multimodal.decode_png) cannot
be: those stay as the *correctness oracle* — the parity pytests pin the two
tiers against each other (bit-exact for PNG, small bounded error for JPEG,
where every decoder differs slightly by spec).

Fully optional: if a compiler, the headers, or the libraries are missing,
``available()`` returns False and ``DecodeImageStage`` silently falls back
to the pure-python tier.  Nothing is downloaded; only what the container
already ships is used.

Semantics matched to the python tier:
- JPEG: RGB24 output, *replication* chroma upsampling
  (``do_fancy_upsampling = FALSE``) and ``JDCT_ISLOW``, so 4:2:0/4:2:2
  output lines up with jpeg.py's ``np.repeat`` upsample.  Grayscale is
  expanded to RGB by libjpeg (same replication as the python tier).
- PNG: decoded as RGBA and alpha *dropped* caller-side (never composited),
  matching decode_png's drop-alpha semantics; gray replicates to RGB.
  PNGs carrying color-management chunks (gAMA/sRGB with non-default
  values) may differ from the naive tier, which ignores them.

Actor-pool friendly: the compiled .so is cached per node at a
content-hashed path, so each worker process pays one dlopen, and only the
first process on a node pays the (sub-second) compile.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile
from ctypes import POINTER, byref, c_char_p, c_int, c_size_t, c_ubyte

import numpy as np

_C_SRC = r"""
#include <stddef.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>
#include <stdio.h>
#include <jpeglib.h>
#include <png.h>

struct cr_jerr { struct jpeg_error_mgr mgr; jmp_buf jb; };

static void cr_error_exit(j_common_ptr cinfo) {
    struct cr_jerr *e = (struct cr_jerr *)cinfo->err;
    longjmp(e->jb, 1);
}
/* silence output but KEEP the warning count — libjpeg's default
   emit_message increments num_warnings at msg_level -1 (corrupt data),
   and cr_jpeg_decode turns a nonzero count into a hard failure. */
static void cr_emit_message(j_common_ptr cinfo, int msg_level) {
    if (msg_level < 0) cinfo->err->num_warnings++;
}
static void cr_output_message(j_common_ptr cinfo) { (void)cinfo; }

/* RGB24 out; replication upsampling to match the pure-python tier.
   Any libjpeg warning (truncated stream, corrupt entropy data, bad
   markers) is treated as FATAL (rc=4): libjpeg's default recovery pads
   the image with garbage scanlines, which at pipeline scale is silent
   data corruption — we want corrupt payloads to fail loudly instead. */
int cr_jpeg_decode(const unsigned char *buf, size_t len,
                   unsigned char *out, size_t cap, int *w, int *h) {
    struct jpeg_decompress_struct cinfo;
    struct cr_jerr jerr;
    size_t stride;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = cr_error_exit;
    jerr.mgr.emit_message = cr_emit_message;
    jerr.mgr.output_message = cr_output_message;
    if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&cinfo); return 1; }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    cinfo.do_fancy_upsampling = FALSE;
    cinfo.dct_method = JDCT_ISLOW;
    jpeg_start_decompress(&cinfo);
    if (cinfo.output_components != 3) {
        jpeg_destroy_decompress(&cinfo);
        return 3;
    }
    stride = (size_t)cinfo.output_width * 3u;
    if ((size_t)cinfo.output_height * stride > cap) {
        jpeg_destroy_decompress(&cinfo);
        return 2;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = out + (size_t)cinfo.output_scanline * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    *w = (int)cinfo.output_width;
    *h = (int)cinfo.output_height;
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    if (jerr.mgr.num_warnings != 0) return 4;
    return 0;
}

/* PROGRESSIVE (SOF2) encoder — fixture-generation path only: the
   container has no other way to produce a progressive stream, and the
   decode tests need one.  jpeg_simple_progression emits libjpeg's
   standard spectral-selection/successive-approximation scan script. */
int cr_jpeg_encode_prog(const unsigned char *rgb, int w, int h, int quality,
                        unsigned char *out, size_t cap, size_t *outlen) {
    struct jpeg_compress_struct cinfo;
    struct cr_jerr jerr;
    unsigned char *mem = NULL;
    unsigned long memlen = 0;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = cr_error_exit;
    jerr.mgr.emit_message = cr_emit_message;
    jerr.mgr.output_message = cr_output_message;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_compress(&cinfo);
        if (mem) free(mem);
        return 1;
    }
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, &mem, &memlen);
    cinfo.image_width = (JDIMENSION)w;
    cinfo.image_height = (JDIMENSION)h;
    cinfo.input_components = 3;
    cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    jpeg_simple_progression(&cinfo);
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = (JSAMPROW)(rgb + (size_t)cinfo.next_scanline
                                  * (size_t)w * 3u);
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    if ((size_t)memlen > cap) { free(mem); return 2; }
    memcpy(out, mem, (size_t)memlen);
    *outlen = (size_t)memlen;
    free(mem);
    return 0;
}

/* RGBA out (alpha dropped caller-side: RGBA inputs are NOT composited,
   matching the pure-python drop-alpha semantics). */
int cr_png_decode(const unsigned char *buf, size_t len,
                  unsigned char *out, size_t cap, int *w, int *h) {
    png_image img;
    memset(&img, 0, sizeof img);
    img.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&img, buf, len)) return 1;
    img.format = PNG_FORMAT_RGBA;
    if ((size_t)PNG_IMAGE_SIZE(img) > cap) { png_image_free(&img); return 2; }
    if (!png_image_finish_read(&img, NULL, out, 0, NULL)) {
        png_image_free(&img);
        return 1;
    }
    *w = (int)img.width;
    *h = (int)img.height;
    return 0;
}
"""

# Per-uid cache dir: the .so path is content-hashed from public source, so
# a shared world-writable dir would let another local user pre-plant a
# malicious library at the predictable path. The dir is created 0700 and
# both it and the cached .so are ownership-checked before any dlopen.
_CACHE_DIR = os.environ.get(
    "CHRONON_NATIVE_CACHE", f"/tmp/chronon_ray_native_uid{os.getuid()}")

_lib = None
_tried = False


def _owned_by_us(path: str) -> bool:
    try:
        st = os.stat(path, follow_symlinks=False)
    except OSError:
        return False
    return st.st_uid == os.getuid()


def _build() -> str | None:
    """Compile the shim once per node; cached at a content-hashed path so a
    source change never collides with a stale binary."""
    tag = hashlib.sha1(_C_SRC.encode()).hexdigest()[:16]
    so_path = os.path.join(_CACHE_DIR, f"crdecode_{tag}.so")
    if os.path.exists(so_path):
        if _owned_by_us(_CACHE_DIR) and _owned_by_us(so_path):
            return so_path
        return None  # pre-planted by someone else — refuse to load
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        return None
    os.makedirs(_CACHE_DIR, mode=0o700, exist_ok=True)
    if not _owned_by_us(_CACHE_DIR):
        return None
    with tempfile.TemporaryDirectory(dir=_CACHE_DIR) as td:
        src = os.path.join(td, "crdecode.c")
        with open(src, "w") as f:
            f.write(_C_SRC)
        tmp = os.path.join(td, "crdecode.so")
        r = subprocess.run(
            [cc, "-O2", "-shared", "-fPIC", src, "-o", tmp,
             "-ljpeg", "-lpng16", "-lz", "-Wl,--no-undefined"],
            capture_output=True)
        if r.returncode != 0:
            return None
        os.replace(tmp, so_path)  # atomic: concurrent builders both succeed
    return so_path


def _smoke(lib) -> bool:
    """Decode one tiny image per codec through the freshly-loaded shim and
    check it against the pure-python oracle — guards against an ABI or
    libpng-build surprise turning into silent corruption."""
    from .jpeg import decode_jpeg_baseline, encode_jpeg_baseline
    from .multimodal import decode_png, encode_png

    rng = np.random.Generator(np.random.PCG64(7))
    pix = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)

    png = encode_png(pix, filter_type=4)
    got = _decode_png(lib, png)
    if not np.array_equal(got, decode_png(png)):
        return False

    jpg = encode_jpeg_baseline(pix, quality=90, subsample="420")
    got = _decode_jpeg(lib, jpg)
    ref = decode_jpeg_baseline(jpg)
    if got.shape != ref.shape:
        return False
    # decoders legitimately differ by a few levels (IDCT rounding; libjpeg
    # clamps samples to 8-bit pre-color-convert, the python tier does not)
    if np.abs(got.astype(np.int16) - ref.astype(np.int16)).max() > 24:
        return False
    return True


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        so_path = _build()
        if so_path is None:
            return None
        lib = ctypes.CDLL(so_path)
        for name in ("cr_jpeg_decode", "cr_png_decode"):
            fn = getattr(lib, name)
            fn.restype = c_int
            fn.argtypes = [c_char_p, c_size_t, POINTER(c_ubyte), c_size_t,
                           POINTER(c_int), POINTER(c_int)]
        enc = lib.cr_jpeg_encode_prog
        enc.restype = c_int
        enc.argtypes = [POINTER(c_ubyte), c_int, c_int, c_int,
                        POINTER(c_ubyte), c_size_t, POINTER(c_size_t)]
        if not _smoke(lib):
            return None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    """True when the native tier compiled, loaded, and passed its
    single-image parity smoke test on this node."""
    return _load() is not None


# Header dims are parsed in PYTHON (a few-byte marker walk) so the C side
# parses each stream exactly once — the earlier design called a C dims
# entry point whose jpeg_read_header / png_image_begin_read work was then
# repeated inside the decode call.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _jpeg_dims(buf: bytes) -> tuple[int, int]:
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    pos = 2
    n = len(buf)
    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        if marker == 0xFF:  # legal fill byte before a marker
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker in (0xD9, 0xDA):
            # EOI, or SOS with no SOF seen: stop — walking into
            # entropy-coded data can misread garbage dims (up to
            # 65535×65535 → a multi-GB allocation before the C-side cap
            # check would catch it)
            break
        ln = int.from_bytes(buf[pos:pos + 2], "big")
        if marker in _SOF_MARKERS and pos + 7 <= n:
            h = int.from_bytes(buf[pos + 3:pos + 5], "big")
            w = int.from_bytes(buf[pos + 5:pos + 7], "big")
            return h, w
        pos += ln
    raise ValueError("libjpeg: cannot parse JPEG header")


def _png_dims(buf: bytes) -> tuple[int, int]:
    if len(buf) < 24 or buf[:8] != _PNG_SIG or buf[12:16] != b"IHDR":
        raise ValueError("libpng: cannot parse PNG header")
    w = int.from_bytes(buf[16:20], "big")
    h = int.from_bytes(buf[20:24], "big")
    return h, w


def _decode_jpeg(lib, buf: bytes) -> np.ndarray:
    hh, ww = _jpeg_dims(buf)
    w, h = c_int(), c_int()
    out = np.empty(hh * ww * 3, dtype=np.uint8)
    rc = lib.cr_jpeg_decode(buf, len(buf),
                            out.ctypes.data_as(POINTER(c_ubyte)), out.size,
                            byref(w), byref(h))
    if rc:
        raise ValueError(f"libjpeg: decode failed (rc={rc})")
    # the C side re-checks output dims against the buffer cap (rc=2), so a
    # python/libjpeg dims disagreement can never overflow — just re-shape
    return out[:h.value * w.value * 3].reshape(h.value, w.value, 3)


def _decode_png(lib, buf: bytes) -> np.ndarray:
    hh, ww = _png_dims(buf)
    w, h = c_int(), c_int()
    out = np.empty(hh * ww * 4, dtype=np.uint8)
    rc = lib.cr_png_decode(buf, len(buf),
                           out.ctypes.data_as(POINTER(c_ubyte)), out.size,
                           byref(w), byref(h))
    if rc:
        raise ValueError(f"libpng: decode failed (rc={rc})")
    rgba = out[:h.value * w.value * 4].reshape(h.value, w.value, 4)
    return np.ascontiguousarray(rgba[:, :, :3])


def decode_jpeg_native(buf: bytes) -> np.ndarray:
    """Baseline/progressive JPEG bytes → uint8 (h, w, 3) RGB via libjpeg."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decode tier unavailable")
    return _decode_jpeg(lib, buf)


def decode_png_native(buf: bytes) -> np.ndarray:
    """PNG bytes → uint8 (h, w, 3) RGB via libpng (alpha dropped)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decode tier unavailable")
    return _decode_png(lib, buf)


def encode_jpeg_progressive_native(pix: np.ndarray,
                                   quality: int = 90) -> bytes:
    """uint8 (h, w, 3) RGB → PROGRESSIVE (SOF2) JPEG bytes via libjpeg's
    jpeg_simple_progression.  Fixture-generation only — the decode side is
    the product surface (decode_jpeg_native handles SOF2; the pure-python
    tier refuses it loudly as its documented boundary)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decode tier unavailable")
    h, w, ch = pix.shape
    if ch != 3 or pix.dtype != np.uint8:
        raise ValueError("expected uint8 (h, w, 3) RGB")
    pix = np.ascontiguousarray(pix)
    cap = h * w * 3 + (1 << 16)
    out = np.empty(cap, dtype=np.uint8)
    outlen = c_size_t()
    rc = lib.cr_jpeg_encode_prog(
        pix.ctypes.data_as(POINTER(c_ubyte)), c_int(w), c_int(h),
        c_int(quality), out.ctypes.data_as(POINTER(c_ubyte)),
        c_size_t(cap), byref(outlen))
    if rc:
        raise ValueError(f"libjpeg: progressive encode failed (rc={rc})")
    return out[:outlen.value].tobytes()
