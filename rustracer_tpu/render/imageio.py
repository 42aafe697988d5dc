"""Image I/O: PNG/TGA/EXR/HDR/PFM read; PNG/EXR write.

Reference: rustracer-core/src/imageio.rs (PNG/TGA via the `image` crate with
sRGB→linear, EXR via the `exr` crate, hand-rolled HDR/PFM readers, PNG
gamma-encoded 8-bit + EXR float writers). PNG/TGA go through PIL here; EXR
(scanline, none/ZIP/ZIPS compression, half/float) , Radiance HDR (RGBE) and
PFM are hand-rolled with numpy.
"""
from __future__ import annotations

import os
import struct
import zlib

import numpy as np

from ..core.spectrum import srgb_decode_np

EXR_MAGIC = 20000630


# ---------------------------------------------------------------------------
# readers
# ---------------------------------------------------------------------------

def read_image(path: str) -> np.ndarray:
    """→ (H, W, 3) float32 LINEAR RGB (imageio.rs:16 read_image)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".png", ".tga", ".jpg", ".jpeg", ".bmp"):
        from PIL import Image
        img = Image.open(path).convert("RGB")
        arr = np.asarray(img, np.float32) / 255.0
        return srgb_decode_np(arr)
    if ext == ".exr":
        return read_exr(path)
    if ext == ".hdr":
        return read_hdr(path)
    if ext == ".pfm":
        return read_pfm(path)
    raise ValueError(f"unsupported image format: {path}")


def read_pfm(path: str) -> np.ndarray:
    """PFM incl. endian handling (imageio.rs:179-246)."""
    with open(path, "rb") as f:
        header = f.readline().strip()
        if header not in (b"PF", b"Pf"):
            raise ValueError(f"{path}: not a PFM file")
        color = header == b"PF"
        dims = f.readline().split()
        while len(dims) < 2:
            dims += f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline().strip())
        dtype = "<f4" if scale < 0 else ">f4"
        count = w * h * (3 if color else 1)
        data = np.frombuffer(f.read(count * 4), dtype=dtype, count=count)
        data = data.astype(np.float32) * abs(scale) if abs(scale) != 1.0 \
            else data.astype(np.float32)
        if color:
            img = data.reshape(h, w, 3)
        else:
            img = np.repeat(data.reshape(h, w, 1), 3, axis=2)
        return img[::-1].copy()  # PFM stores bottom-up


def read_hdr(path: str) -> np.ndarray:
    """Radiance RGBE .hdr reader (imageio.rs:114-132)."""
    with open(path, "rb") as f:
        line = f.readline()
        if not line.startswith(b"#?"):
            raise ValueError(f"{path}: not a Radiance HDR file")
        while True:
            line = f.readline()
            if line in (b"\n", b"\r\n", b""):
                break
        dims = f.readline().split()
        # -Y H +X W
        h, w = int(dims[1]), int(dims[3])
        data = f.read()
    rgbe = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        if pos + 4 <= len(data) and data[pos] == 2 and data[pos + 1] == 2 and \
                (data[pos + 2] << 8 | data[pos + 3]) == w:
            # RLE scanline
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    cnt = data[pos]
                    pos += 1
                    if cnt > 128:
                        rgbe[y, x:x + cnt - 128, c] = data[pos]
                        pos += 1
                        x += cnt - 128
                    else:
                        rgbe[y, x:x + cnt, c] = np.frombuffer(
                            data[pos:pos + cnt], np.uint8)
                        pos += cnt
                        x += cnt
        else:
            row = np.frombuffer(data[pos:pos + 4 * w], np.uint8).reshape(w, 4)
            rgbe[y] = row
            pos += 4 * w
    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp == 0, 0.0,
                     np.ldexp(1.0, exp - 136)).astype(np.float32)
    return (rgbe[..., :3].astype(np.float32) + 0.5) * scale[..., None] * \
        np.where(exp[..., None] == 0, 0.0, 1.0)


def _read_exr_header(f):
    attrs = {}
    while True:
        name = b""
        while True:
            c = f.read(1)
            if c == b"\x00":
                break
            name += c
        if name == b"":
            break
        ty = b""
        while True:
            c = f.read(1)
            if c == b"\x00":
                break
            ty += c
        size = struct.unpack("<i", f.read(4))[0]
        attrs[name.decode()] = (ty.decode(), f.read(size))
    return attrs


def _parse_chlist(data: bytes):
    chans = []
    pos = 0
    while data[pos] != 0:
        name = b""
        while data[pos] != 0:
            name += data[pos:pos + 1]
            pos += 1
        pos += 1
        ptype, = struct.unpack_from("<i", data, pos)
        pos += 16
        chans.append((name.decode(), ptype))
    return chans


def read_exr(path: str) -> np.ndarray:
    """Minimal OpenEXR scanline reader: compression none/ZIPS/ZIP,
    half/float channels (imageio.rs:134-160 capability parity)."""
    with open(path, "rb") as f:
        magic, version = struct.unpack("<ii", f.read(8))
        if magic != EXR_MAGIC:
            raise ValueError(f"{path}: not an EXR file")
        if version & 0x200:
            raise ValueError(f"{path}: tiled/multipart EXR unsupported")
        attrs = _read_exr_header(f)
        chans = _parse_chlist(attrs["channels"][1])
        comp = attrs["compression"][1][0]
        x0, y0, x1, y1 = struct.unpack("<4i", attrs["dataWindow"][1])
        w = x1 - x0 + 1
        h = y1 - y0 + 1
        if comp == 0:
            lines_per_chunk = 1
        elif comp == 2:
            lines_per_chunk = 1   # ZIPS
        elif comp == 3:
            lines_per_chunk = 16  # ZIP
        else:
            raise ValueError(f"{path}: EXR compression {comp} unsupported "
                             "(none/ZIP/ZIPS only)")
        n_chunks = -(-h // lines_per_chunk)
        f.read(8 * n_chunks)  # offset table (sequential read, ignore)
        dt = {1: np.float16, 2: np.float32}
        sizes = {1: 2, 2: 4}
        out = {name: np.zeros((h, w), np.float32) for name, _ in chans}
        chans_sorted = sorted(chans)  # storage is alphabetical by channel
        for _ in range(n_chunks):
            y, nbytes = struct.unpack("<ii", f.read(8))
            raw = f.read(nbytes)
            ny = min(lines_per_chunk, y1 - y + 1)
            expect = ny * sum(w * sizes[pt] for _, pt in chans_sorted)
            if comp in (2, 3):
                raw = zlib.decompress(raw)
                if len(raw) == expect:
                    # undo EXR predictor + interleave
                    arr = np.frombuffer(raw, np.uint8).astype(np.int16)
                    arr = np.cumsum(arr - 128, dtype=np.int64) % 256
                    arr2 = arr.astype(np.uint8)
                    half = (len(arr2) + 1) // 2
                    out_b = np.zeros(len(arr2), np.uint8)
                    out_b[0::2] = arr2[:half]
                    out_b[1::2] = arr2[half:]
                    raw = out_b.tobytes()
            pos = 0
            for line in range(ny):
                for name, pt in chans_sorted:
                    n = w * sizes[pt]
                    vals = np.frombuffer(raw[pos:pos + n], dt[pt]).astype(np.float32)
                    out[name][y - y0 + line] = vals
                    pos += n
    if all(k in out for k in "RGB"):
        return np.stack([out["R"], out["G"], out["B"]], -1)
    if "Y" in out:
        return np.repeat(out["Y"][..., None], 3, -1)
    first = next(iter(out.values()))
    return np.repeat(first[..., None], 3, -1)


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------

def write_image(path: str, img: np.ndarray):
    """Linear RGB (H, W, 3) → file by extension (imageio.rs:35 write_image)."""
    ext = os.path.splitext(path)[1].lower()
    img = np.asarray(img, np.float32)
    if ext == ".png" or ext == "":
        write_png(path if ext else path + ".png", img)
    elif ext == ".exr":
        write_exr(path, img)
    elif ext == ".tga":
        from PIL import Image
        arr = _to_srgb8(img)
        Image.fromarray(arr).save(path)
    else:
        raise ValueError(f"unsupported output format {ext}")


def _to_srgb8(img):
    img = np.clip(img, 0.0, 1.0)
    srgb = np.where(img <= 0.0031308, 12.92 * img,
                    1.055 * np.power(np.maximum(img, 1e-8), 1 / 2.4) - 0.055)
    return (np.clip(srgb, 0, 1) * 255 + 0.5).astype(np.uint8)


def write_png(path: str, img: np.ndarray):
    """Gamma-corrected 8-bit PNG (imageio.rs:52-74)."""
    from PIL import Image
    Image.fromarray(_to_srgb8(img)).save(path)


def _exr_attr(name: str, ty: str, data: bytes) -> bytes:
    return name.encode() + b"\x00" + ty.encode() + b"\x00" + \
        struct.pack("<i", len(data)) + data


def write_exr(path: str, img: np.ndarray):
    """Uncompressed float32 scanline EXR writer (imageio.rs:76-92)."""
    h, w = img.shape[:2]
    chlist = b""
    for name in ("B", "G", "R"):
        chlist += name.encode() + b"\x00" + struct.pack("<i", 2) + \
            b"\x00\x00\x00\x00" + struct.pack("<ii", 1, 1)
    chlist += b"\x00"
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header = b""
    header += _exr_attr("channels", "chlist", chlist)
    header += _exr_attr("compression", "compression", b"\x00")
    header += _exr_attr("dataWindow", "box2i", box)
    header += _exr_attr("displayWindow", "box2i", box)
    header += _exr_attr("lineOrder", "lineOrder", b"\x00")
    header += _exr_attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _exr_attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    header += _exr_attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", EXR_MAGIC, 2))
        f.write(header)
        offset0 = 8 + len(header) + 8 * h
        line_bytes = 8 + 3 * 4 * w
        for y in range(h):
            f.write(struct.pack("<Q", offset0 + y * line_bytes))
        for y in range(h):
            f.write(struct.pack("<ii", y, 3 * 4 * w))
            # channels alphabetical: B, G, R
            f.write(img[y, :, 2].astype("<f4").tobytes())
            f.write(img[y, :, 1].astype("<f4").tobytes())
            f.write(img[y, :, 0].astype("<f4").tobytes())
