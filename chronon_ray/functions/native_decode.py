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
static void cr_emit_message(j_common_ptr cinfo, int msg_level) {
    (void)cinfo; (void)msg_level;
}
static void cr_output_message(j_common_ptr cinfo) { (void)cinfo; }

int cr_jpeg_dims(const unsigned char *buf, size_t len, int *w, int *h) {
    struct jpeg_decompress_struct cinfo;
    struct cr_jerr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = cr_error_exit;
    jerr.mgr.emit_message = cr_emit_message;
    jerr.mgr.output_message = cr_output_message;
    if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&cinfo); return 1; }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    *w = (int)cinfo.image_width;
    *h = (int)cinfo.image_height;
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

/* RGB24 out; replication upsampling to match the pure-python tier. */
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
    return 0;
}

int cr_png_dims(const unsigned char *buf, size_t len, int *w, int *h) {
    png_image img;
    memset(&img, 0, sizeof img);
    img.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&img, buf, len)) return 1;
    *w = (int)img.width;
    *h = (int)img.height;
    png_image_free(&img);
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

_CACHE_DIR = os.environ.get("CHRONON_NATIVE_CACHE", "/tmp/chronon_ray_native")

_lib = None
_tried = False


def _build() -> str | None:
    """Compile the shim once per node; cached at a content-hashed path so a
    source change never collides with a stale binary."""
    tag = hashlib.sha1(_C_SRC.encode()).hexdigest()[:16]
    so_path = os.path.join(_CACHE_DIR, f"crdecode_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        return None
    os.makedirs(_CACHE_DIR, exist_ok=True)
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
        for name in ("cr_jpeg_dims", "cr_png_dims"):
            fn = getattr(lib, name)
            fn.restype = c_int
            fn.argtypes = [c_char_p, c_size_t, POINTER(c_int), POINTER(c_int)]
        for name in ("cr_jpeg_decode", "cr_png_decode"):
            fn = getattr(lib, name)
            fn.restype = c_int
            fn.argtypes = [c_char_p, c_size_t, POINTER(c_ubyte), c_size_t,
                           POINTER(c_int), POINTER(c_int)]
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


def _decode_jpeg(lib, buf: bytes) -> np.ndarray:
    w, h = c_int(), c_int()
    if lib.cr_jpeg_dims(buf, len(buf), byref(w), byref(h)):
        raise ValueError("libjpeg: cannot parse JPEG header")
    out = np.empty(h.value * w.value * 3, dtype=np.uint8)
    rc = lib.cr_jpeg_decode(buf, len(buf),
                            out.ctypes.data_as(POINTER(c_ubyte)), out.size,
                            byref(w), byref(h))
    if rc:
        raise ValueError(f"libjpeg: decode failed (rc={rc})")
    return out.reshape(h.value, w.value, 3)


def _decode_png(lib, buf: bytes) -> np.ndarray:
    w, h = c_int(), c_int()
    if lib.cr_png_dims(buf, len(buf), byref(w), byref(h)):
        raise ValueError("libpng: cannot parse PNG header")
    out = np.empty(h.value * w.value * 4, dtype=np.uint8)
    rc = lib.cr_png_decode(buf, len(buf),
                           out.ctypes.data_as(POINTER(c_ubyte)), out.size,
                           byref(w), byref(h))
    if rc:
        raise ValueError(f"libpng: decode failed (rc={rc})")
    rgba = out.reshape(h.value, w.value, 4)
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
