"""Minimal pure-Python DICOM reader/writer for uncompressed CT series.

The reference bundles DCMTK binaries to own its DICOM dependency
(`VolumeTextureToolkit.Build.cs:38-66`, codec registration in
`Private/VolumeTextureToolkit.cpp:24-67`); in the same spirit this module owns
a small, dependency-free DICOM Part-10 implementation sufficient for the
loader semantics `UDCMTKLoader` implements (`DCMTKLoader.cpp:84-263,434-544`):
series-UID grouping, InstanceNumber ordering, pixel spacing, slice thickness,
bits-allocated/pixel-representation, single- and multi-frame pixel data.

Supported transfer syntaxes: Implicit VR Little Endian (1.2.840.10008.1.2),
Explicit VR Little Endian (1.2.840.10008.1.2.1), RLE Lossless
(1.2.840.10008.1.2.5 — PS3.5 Annex G PackBits segments, decoded and encoded
in pure numpy), and JPEG Lossless process 14 (1.2.840.10008.1.2.4.70 SV1 —
the common compressed-CT archive syntax — and .57; T.81 Huffman decode +
cumsum-vectorized predictor reconstruction, SV1 encoder included). The
reference registers the matching DCMTK codecs at module start
(`Private/VolumeTextureToolkit.cpp:24-67`). Lossy/DCT syntaxes (JPEG
baseline, JPEG-LS, JPEG2000) still raise a clear error: a faithful
pure-Python DCT codec is out of scope — convert such series to MHD or
install pydicom (which, when present, takes precedence in :mod:`.loaders`).

API mirrors the pydicom subset the loader uses: :func:`dcmread` returning a
:class:`Dataset` with keyword attribute access and ``pixel_array``.
"""

from __future__ import annotations

import os
import struct
from typing import Any, Optional

import numpy as np

IMPLICIT_VR_LE = "1.2.840.10008.1.2"
EXPLICIT_VR_LE = "1.2.840.10008.1.2.1"
RLE_LOSSLESS = "1.2.840.10008.1.2.5"
JPEG_LOSSLESS_SV1 = "1.2.840.10008.1.2.4.70"  # process 14, selection value 1
JPEG_LOSSLESS_P14 = "1.2.840.10008.1.2.4.57"  # process 14, any predictor

# Keyword -> (group, element, VR). Only the attributes the loader stack and
# the fixture writer need.
_DICT: dict[str, tuple[int, int, str]] = {
    "FileMetaInformationGroupLength": (0x0002, 0x0000, "UL"),
    "MediaStorageSOPClassUID": (0x0002, 0x0002, "UI"),
    "MediaStorageSOPInstanceUID": (0x0002, 0x0003, "UI"),
    "TransferSyntaxUID": (0x0002, 0x0010, "UI"),
    "ImplementationClassUID": (0x0002, 0x0012, "UI"),
    "SOPClassUID": (0x0008, 0x0016, "UI"),
    "SOPInstanceUID": (0x0008, 0x0018, "UI"),
    "Modality": (0x0008, 0x0060, "CS"),
    "SeriesDescription": (0x0008, 0x103E, "LO"),
    "PatientName": (0x0010, 0x0010, "PN"),
    "PatientID": (0x0010, 0x0020, "LO"),
    "SliceThickness": (0x0018, 0x0050, "DS"),
    "StudyInstanceUID": (0x0020, 0x000D, "UI"),
    "SeriesInstanceUID": (0x0020, 0x000E, "UI"),
    "SeriesNumber": (0x0020, 0x0011, "IS"),
    "InstanceNumber": (0x0020, 0x0013, "IS"),
    "ImagePositionPatient": (0x0020, 0x0032, "DS"),
    "ImageOrientationPatient": (0x0020, 0x0037, "DS"),
    "SamplesPerPixel": (0x0028, 0x0002, "US"),
    "PhotometricInterpretation": (0x0028, 0x0004, "CS"),
    "NumberOfFrames": (0x0028, 0x0008, "IS"),
    "Rows": (0x0028, 0x0010, "US"),
    "Columns": (0x0028, 0x0011, "US"),
    "PixelSpacing": (0x0028, 0x0030, "DS"),
    "BitsAllocated": (0x0028, 0x0100, "US"),
    "BitsStored": (0x0028, 0x0101, "US"),
    "HighBit": (0x0028, 0x0102, "US"),
    "PixelRepresentation": (0x0028, 0x0103, "US"),
    "RescaleIntercept": (0x0028, 0x1052, "DS"),
    "RescaleSlope": (0x0028, 0x1053, "DS"),
    "WindowCenter": (0x0028, 0x1050, "DS"),
    "WindowWidth": (0x0028, 0x1051, "DS"),
    "PixelData": (0x7FE0, 0x0010, "OW"),
}
_TAG_TO_KEYWORD = {(g, e): kw for kw, (g, e, _vr) in _DICT.items()}
_TAG_TO_VR = {(g, e): vr for _kw, (g, e, vr) in _DICT.items()}

_STR_VRS = {"AE", "AS", "CS", "DA", "DT", "LO", "LT", "PN", "SH", "ST", "TM",
            "UC", "UI", "UR", "UT"}
_LONG_LEN_VRS = {"OB", "OD", "OF", "OL", "OW", "SQ", "UC", "UN", "UR", "UT"}


class Dataset:
    """Attribute-access DICOM dataset (pydicom-subset compatible)."""

    def __init__(self) -> None:
        self._elements: dict[tuple[int, int], Any] = {}
        self._pixel_data: Optional[bytes] = None
        self._rle_fragments: Optional[list] = None
        self._jpeg_fragments: Optional[list] = None

    # -- element access ------------------------------------------------------

    def __contains__(self, keyword: str) -> bool:
        return keyword in _DICT and _DICT[keyword][:2] in self._elements

    def __getattr__(self, keyword: str) -> Any:
        if keyword.startswith("_"):
            raise AttributeError(keyword)
        if keyword in _DICT:
            tag = _DICT[keyword][:2]
            if tag in self._elements:
                return self._elements[tag]
        raise AttributeError(keyword)

    def __setattr__(self, keyword: str, value: Any) -> None:
        if keyword.startswith("_"):
            super().__setattr__(keyword, value)
        elif keyword in _DICT:
            self._elements[_DICT[keyword][:2]] = value
        else:
            raise AttributeError(f"unknown DICOM keyword {keyword!r}")

    def get(self, keyword: str, default: Any = None) -> Any:
        return getattr(self, keyword, default)

    def keys(self):
        return [
            _TAG_TO_KEYWORD[t] for t in self._elements if t in _TAG_TO_KEYWORD
        ]

    # -- pixel data ----------------------------------------------------------

    @property
    def pixel_array(self) -> np.ndarray:
        """Decode uncompressed PixelData into (frames,)rows x cols.

        Mirrors what the reference gets from `DicomImage`/`getOutputData`
        (`DCMTKLoader.cpp:392-399`) for uncompressed syntaxes.
        """
        if self._pixel_data is None and self._rle_fragments is not None:
            # RLE Lossless: one fragment per frame (PS3.5 A.4.2)
            rows, cols = int(self.Rows), int(self.Columns)
            bits = int(self.get("BitsAllocated", 16))
            self._pixel_data = b"".join(
                _rle_decode_frame(f, rows, cols, bits)
                for f in self._rle_fragments
            )
        if self._pixel_data is None and self._jpeg_fragments is not None:
            # JPEG Lossless (process 14). PS3.5 A.4 allows one frame's
            # codestream to span several fragments: start a new stream at
            # each SOI marker, append continuation fragments to the open one.
            bits = int(self.get("BitsAllocated", 16))
            streams = []
            for f in self._jpeg_fragments:
                if f[:2] == b"\xff\xd8" or not streams:
                    streams.append(bytes(f))
                else:
                    streams[-1] += bytes(f)
            frames = []
            for s in streams:
                dec = _jpeg_lossless_decode(s)
                frames.append(
                    dec.astype("<u1" if bits == 8 else "<u2").tobytes()
                )
            self._pixel_data = b"".join(frames)
        if self._pixel_data is None:
            raise AttributeError("dataset has no PixelData (header-only read?)")
        bits = int(self.get("BitsAllocated", 16))
        signed = int(self.get("PixelRepresentation", 0)) == 1
        dtype = {
            (8, False): np.uint8, (8, True): np.int8,
            (16, False): np.uint16, (16, True): np.int16,
            (32, False): np.uint32, (32, True): np.int32,
        }.get((bits, signed))
        if dtype is None:
            raise ValueError(f"unsupported BitsAllocated={bits}")
        rows, cols = int(self.Rows), int(self.Columns)
        frames = int(self.get("NumberOfFrames", 0) or 0)
        n = rows * cols * max(frames, 1)
        arr = np.frombuffer(self._pixel_data, dtype=dtype, count=n)
        if frames > 1:
            return arr.reshape(frames, rows, cols)
        return arr.reshape(rows, cols)


class InvalidDicomError(ValueError):
    pass


# ---------------------------------------------------------------------------
# RLE Lossless codec (PS3.5 Annex G): PackBits-coded byte segments, MSB
# plane first for multi-byte samples. Pure numpy/bytes, both directions.


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:  # replicate next byte 257-h times
            if i < n:
                out += bytes([data[i]]) * (257 - h)
                i += 1
        # h == 128: no-op
    if len(out) < expected:
        raise InvalidDicomError(
            f"RLE segment truncated: {len(out)} < {expected} bytes"
        )
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # replicate run?
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal run until the next >=3 replicate (2 suffices and is valid)
        j = i + 1
        while j < n and j - i < 128:
            if j + 1 < n and data[j] == data[j + 1]:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _rle_decode_frame(frag: bytes, rows: int, cols: int,
                      bits_allocated: int) -> bytes:
    """One encapsulated RLE frame -> little-endian raw pixel bytes."""
    if len(frag) < 64:
        raise InvalidDicomError("RLE frame shorter than its 64-byte header")
    nseg = struct.unpack_from("<I", frag, 0)[0]
    offs = struct.unpack_from("<15I", frag, 4)
    nb = bits_allocated // 8
    if nseg != nb:
        raise InvalidDicomError(
            f"RLE: {nseg} segments for BitsAllocated={bits_allocated} "
            "(only SamplesPerPixel=1 grayscale is supported)"
        )
    n = rows * cols
    planes = []
    for s in range(nseg):
        start = offs[s]
        end = offs[s + 1] if s + 1 < nseg and offs[s + 1] else len(frag)
        planes.append(
            np.frombuffer(_packbits_decode(frag[start:end], n), np.uint8)
        )
    if nb == 1:
        return planes[0].tobytes()
    # segments are MSB-first byte planes; compose little-endian output
    val = np.zeros(n, np.uint32)
    for p in planes:
        val = (val << 8) | p.astype(np.uint32)
    dtype = {2: np.uint16, 4: np.uint32}[nb]
    return val.astype(dtype).tobytes()


def _rle_encode_frame(frame: np.ndarray) -> bytes:
    """(rows, cols) integer array -> one encapsulated RLE frame."""
    arr = np.asarray(frame)
    nb = arr.dtype.itemsize
    if nb > 4:
        raise InvalidDicomError(f"RLE: unsupported itemsize {nb}")
    flat = arr.reshape(-1)
    u = flat.astype(flat.dtype.newbyteorder("<")).view(
        {1: np.uint8, 2: np.uint16, 4: np.uint32}[nb]
    )
    segs = []
    for s in range(nb):  # MSB plane first
        shift = 8 * (nb - 1 - s)
        plane = ((u.astype(np.uint64) >> shift) & 0xFF).astype(np.uint8)
        enc = _packbits_encode(plane.tobytes())
        if len(enc) % 2:
            enc += b"\x00"
        segs.append(enc)
    header = struct.pack("<I", nb)
    off = 64
    offsets = []
    for s in segs:
        offsets.append(off)
        off += len(s)
    offsets += [0] * (15 - len(offsets))
    header += struct.pack("<15I", *offsets)
    return header + b"".join(segs)


# ---------------------------------------------------------------------------
# JPEG Lossless codec (ITU-T T.81 process 14, first-order prediction).
#
# Transfer syntaxes 1.2.840.10008.1.2.4.70 (selection value 1 — the common
# CT archive syntax) and .57 (any predictor). The reference registers the
# matching DCMTK djp14 codec at module start
# (`Private/VolumeTextureToolkit.cpp:24-67`). Pure numpy/Python: the only
# sequential part is the Huffman entropy decode (a 16-bit-peek LUT loop);
# the prediction reconstruction is vectorized — for SV1 the first column is
# a downward cumsum and each row an across cumsum, and JPEG's modulo-65536
# difference arithmetic distributes over the cumsum.


def _huff_lut(counts, symbols):
    """Canonical JPEG Huffman table -> 65536-entry (symbol, length) LUT."""
    lut_sym = np.zeros(1 << 16, np.int32)
    lut_len = np.zeros(1 << 16, np.int32)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            sym = symbols[k]
            k += 1
            lo = code << (16 - ln)
            hi = lo + (1 << (16 - ln))
            lut_sym[lo:hi] = sym
            lut_len[lo:hi] = ln
            code += 1
        code <<= 1
    return lut_sym, lut_len


class _BitReader:
    """MSB-first bit reader over byte-unstuffed scan data."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int):
        while self.nbits < need:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFFFF
            self.nbits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int):
        self.nbits -= n

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v


def _extend(v: int, ssss: int) -> int:
    if ssss == 0:
        return 0
    if v < (1 << (ssss - 1)):
        return v - (1 << ssss) + 1
    return v


def _jpeg_lossless_decode(data: bytes) -> np.ndarray:
    """One JPEG-lossless codestream -> (rows, cols) uint16 sample array."""
    if data[:2] != b"\xff\xd8":
        raise InvalidDicomError("JPEG fragment does not start with SOI")
    pos = 2
    tables = {}
    precision = rows = cols = None
    sv = pt = 0
    table_id = 0
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise InvalidDicomError("JPEG: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seglen]
        if marker == 0xC3:  # SOF3: lossless sequential Huffman
            precision, rows, cols, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if ncomp != 1:
                raise InvalidDicomError(
                    f"JPEG lossless: {ncomp} components (grayscale only)"
                )
        elif marker in (0xC0, 0xC1, 0xC2, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise InvalidDicomError(
                f"JPEG SOF{marker - 0xC0}: not a lossless (SOF3) stream"
            )
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                counts = list(seg[p + 1:p + 17])
                nsym = sum(counts)
                symbols = list(seg[p + 17:p + 17 + nsym])
                # Lossless scans reference DC-class (Tc=0) tables only; a
                # same-id AC table in the same DHT block must not clobber.
                if (tc_th >> 4) == 0:
                    tables[tc_th & 0x0F] = _huff_lut(counts, symbols)
                p += 17 + nsym
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", seg, 0)
            if ri:
                raise InvalidDicomError(
                    "JPEG lossless: restart intervals not supported"
                )
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if ns != 1:
                raise InvalidDicomError("JPEG lossless: multi-component scan")
            table_id = seg[2] >> 4
            sv = seg[1 + 2 * ns]  # Ss = predictor selection value
            pt = seg[3 + 2 * ns] & 0x0F  # Al = point transform
            scan_start = pos + seglen
            break
        pos += seglen
    if scan_start is None or precision is None:
        raise InvalidDicomError("JPEG lossless: missing SOS/SOF3")
    if table_id not in tables:
        raise InvalidDicomError(f"JPEG lossless: no DHT table {table_id}")

    # Byte-unstuff the entropy-coded scan (FF 00 -> FF; stop at any marker).
    raw = data[scan_start:]
    chunks = []
    p = 0
    while True:
        ff = raw.find(b"\xff", p)
        if ff < 0:
            chunks.append(raw[p:])
            break
        nxt = raw[ff + 1] if ff + 1 < len(raw) else 0xD9
        if nxt == 0x00:
            chunks.append(raw[p:ff + 1])
            p = ff + 2
        else:  # a real marker terminates the scan
            chunks.append(raw[p:ff])
            break
    scan = b"".join(chunks)

    lut_sym, lut_len = tables[table_id]
    lut_sym_l = lut_sym.tolist()
    lut_len_l = lut_len.tolist()
    br = _BitReader(scan)
    n = rows * cols
    diffs = np.empty(n, np.int32)
    for i in range(n):
        key = br.peek16()
        ssss = lut_sym_l[key]
        ln = lut_len_l[key]
        if ln == 0:
            raise InvalidDicomError("JPEG lossless: invalid Huffman code")
        br.skip(ln)
        if ssss == 16:
            diffs[i] = 32768
        else:
            diffs[i] = _extend(br.read(ssss), ssss)

    d = diffs.reshape(rows, cols).astype(np.int64)
    init = 1 << (precision - pt - 1)
    if sv == 1:
        # Row 0 chains across from the default prediction; each later row's
        # first sample predicts from the sample ABOVE (T.81 H.1.1), i.e.
        # the first column chains downward — both are cumsums.
        col0 = init + np.cumsum(d[:, 0])
        out = col0[:, None] + np.concatenate(
            [np.zeros((rows, 1), np.int64), np.cumsum(d[:, 1:], axis=1)],
            axis=1,
        )
    elif sv == 2:
        row0 = init + np.cumsum(d[0, :])
        # First sample of each row still predicts from above (H.1.1), and
        # predictor 2 is "above" everywhere: every column chains downward.
        out = row0[None, :] + np.concatenate(
            [np.zeros((1, cols), np.int64), np.cumsum(d[1:, :], axis=0)],
            axis=0,
        )
    else:
        # General predictors 3-7: sequential fallback (rare in DICOM).
        out = np.zeros((rows, cols), np.int64)
        for r in range(rows):
            for c in range(cols):
                if r == 0 and c == 0:
                    px = init
                elif r == 0:
                    px = out[0, c - 1]
                elif c == 0:
                    px = out[r - 1, 0]
                else:
                    ra, rb, rc = out[r, c - 1], out[r - 1, c], out[r - 1, c - 1]
                    px = {
                        3: rc,
                        4: ra + rb - rc,
                        5: ra + ((rb - rc) >> 1),
                        6: rb + ((ra - rc) >> 1),
                        7: (ra + rb) >> 1,
                    }[sv]
                out[r, c] = px + d[r, c]
    out = (out % 65536).astype(np.uint16)
    if pt:
        out = (out << pt).astype(np.uint16)
    return out.reshape(rows, cols)


_ENC_LENGTHS = (2, 2, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 16, 16)


def _enc_table():
    """Fixed canonical table for categories 0..16: (code, length) per cat."""
    counts = [0] * 16
    for ln in _ENC_LENGTHS:
        counts[ln - 1] += 1
    order = sorted(range(17), key=lambda s: (_ENC_LENGTHS[s], s))
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[order[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return counts, order, codes


def _jpeg_lossless_encode_frame(frame: np.ndarray, precision: int) -> bytes:
    """(rows, cols) unsigned samples -> one SV1 JPEG-lossless codestream."""
    arr = np.asarray(frame)
    rows, cols = arr.shape
    a = arr.astype(np.int64)
    init = 1 << (precision - 1)
    d = np.empty((rows, cols), np.int64)
    d[:, 1:] = a[:, 1:] - a[:, :-1]
    d[0, 0] = a[0, 0] - init
    d[1:, 0] = a[1:, 0] - a[:-1, 0]
    # modulo-65536 differences mapped to [-32768, 32767]
    d = ((d + 32768) % 65536) - 32768

    counts, order, codes = _enc_table()
    mag = np.abs(d.reshape(-1))
    ssss = np.zeros(mag.shape, np.int32)
    nz = mag > 0
    ssss[nz] = np.floor(np.log2(mag[nz])).astype(np.int32) + 1
    flat = d.reshape(-1)

    out = bytearray()
    acc = 0
    nbits = 0

    def put(code, ln):
        nonlocal acc, nbits
        acc = (acc << ln) | code
        nbits += ln
        while nbits >= 8:
            b = (acc >> (nbits - 8)) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
            nbits -= 8

    for i in range(flat.size):
        s = int(ssss[i])
        v = int(flat[i])
        if v == -32768:
            put(*codes[16])
            continue
        put(*codes[s])
        if s:
            if v < 0:
                v += (1 << s) - 1
            put(v, s)
    if nbits:
        put((1 << (8 - nbits)) - 1, 8 - nbits)  # pad with 1-bits

    dht_syms = bytes(order)
    dht = struct.pack(">HB", 2 + 1 + 16 + len(dht_syms), 0x00)
    dht += bytes(counts) + dht_syms
    sof = struct.pack(">HBHHB", 8 + 3, precision, rows, cols, 1)
    sof += bytes([1, 0x11, 0])  # component 1, 1x1 sampling, Tq=0
    sos = struct.pack(">HB", 6 + 2, 1) + bytes([1, 0x00, 1, 0, 0])
    return (b"\xff\xd8" + b"\xff\xc4" + dht + b"\xff\xc3" + sof
            + b"\xff\xda" + sos + bytes(out) + b"\xff\xd9")


def _parse_value(vr: str, raw: bytes) -> Any:
    if vr in _STR_VRS:
        s = raw.decode("ascii", errors="replace").rstrip("\x00 ").strip()
        if "\\" in s:
            return [p.strip() for p in s.split("\\")]
        return s
    if vr == "DS":
        s = raw.decode("ascii", errors="replace").strip("\x00 ")
        parts = [p for p in s.split("\\") if p.strip()]
        vals = [float(p) for p in parts]
        return vals if len(vals) != 1 else vals[0]
    if vr == "IS":
        s = raw.decode("ascii", errors="replace").strip("\x00 ")
        parts = [p for p in s.split("\\") if p.strip()]
        vals = [int(p) for p in parts]
        return vals if len(vals) != 1 else vals[0]
    fmt = {"US": "<H", "SS": "<h", "UL": "<I", "SL": "<i",
           "FL": "<f", "FD": "<d", "AT": "<HH"}.get(vr)
    if fmt is not None and vr != "AT":
        size = struct.calcsize(fmt)
        if len(raw) >= size:
            vals = [v[0] for v in struct.iter_unpack(fmt, raw[: len(raw) // size * size])]
            return vals if len(vals) != 1 else vals[0]
        return None
    return raw  # OB/OW/UN and anything else: raw bytes


def _read_element(buf: bytes, pos: int, explicit: bool):
    """Returns (tag, vr, value_bytes_or_None_for_SQ, new_pos)."""
    group, elem = struct.unpack_from("<HH", buf, pos)
    pos += 4
    tag = (group, elem)
    if explicit or group == 0x0002:
        vr = buf[pos:pos + 2].decode("ascii", errors="replace")
        pos += 2
        if vr in _LONG_LEN_VRS:
            pos += 2  # reserved
            (length,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        else:
            (length,) = struct.unpack_from("<H", buf, pos)
            pos += 2
    else:
        vr = _TAG_TO_VR.get(tag, "UN")
        (length,) = struct.unpack_from("<I", buf, pos)
        pos += 4

    if vr == "SQ" or length == 0xFFFFFFFF:
        # Skip sequences / undefined-length items: walk items until the
        # sequence delimitation tag (FFFE,E0DD).
        depth = 1
        while depth > 0 and pos < len(buf):
            g, e = struct.unpack_from("<HH", buf, pos)
            pos += 4
            (ln,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            if (g, e) == (0xFFFE, 0xE000):  # item
                if ln != 0xFFFFFFFF:
                    pos += ln
            elif (g, e) == (0xFFFE, 0xE00D):  # item delimiter
                pass
            elif (g, e) == (0xFFFE, 0xE0DD):  # sequence delimiter
                depth -= 1
            else:  # nested element inside undefined-length item — re-scan
                pos -= 8
                _tag, _vr, _val, pos = _read_element(buf, pos, explicit)
        return tag, vr, None, pos

    value = buf[pos:pos + length]
    pos += length
    return tag, vr, value, pos


def _read_encapsulated(buf: bytes, pos: int):
    """Parse an encapsulated (undefined-length OB) PixelData element at
    ``pos`` (after the tag): returns (fragments, new_pos). The first item
    is the Basic Offset Table (possibly empty); the rest are fragments."""
    vr = buf[pos:pos + 2].decode("ascii", errors="replace")
    if vr != "OB":
        raise InvalidDicomError(f"encapsulated PixelData with VR {vr!r}")
    (length,) = struct.unpack_from("<I", buf, pos + 4)
    pos += 8
    if length != 0xFFFFFFFF:
        raise InvalidDicomError("encapsulated PixelData with defined length")
    items = []
    while pos + 8 <= len(buf):
        g, e = struct.unpack_from("<HH", buf, pos)
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        if (g, e) == (0xFFFE, 0xE0DD):  # sequence delimiter
            break
        if (g, e) != (0xFFFE, 0xE000):
            raise InvalidDicomError(
                f"unexpected tag ({g:04x},{e:04x}) in encapsulated PixelData"
            )
        items.append(buf[pos:pos + ln])
        pos += ln
    return items[1:], pos  # drop the Basic Offset Table item


def dcmread(path: str, stop_before_pixels: bool = False) -> Dataset:
    """Read a DICOM Part-10 file (uncompressed LE + RLE Lossless)."""
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 132 + 8 or buf[128:132] != b"DICM":
        raise InvalidDicomError(f"{path}: missing DICM magic")
    ds = Dataset()
    pos = 132

    # File meta group (always explicit VR LE).
    transfer_syntax = EXPLICIT_VR_LE
    while pos + 8 <= len(buf):
        group = struct.unpack_from("<H", buf, pos)[0]
        if group != 0x0002:
            break
        tag, vr, raw, pos = _read_element(buf, pos, explicit=True)
        if raw is not None:
            val = _parse_value(vr, raw)
            if tag == _DICT["TransferSyntaxUID"][:2]:
                transfer_syntax = val
            ds._elements[tag] = val

    if transfer_syntax not in (IMPLICIT_VR_LE, EXPLICIT_VR_LE, RLE_LOSSLESS,
                               JPEG_LOSSLESS_SV1, JPEG_LOSSLESS_P14):
        raise InvalidDicomError(
            f"{path}: compressed/unsupported transfer syntax {transfer_syntax}"
            " — convert to MHD or install pydicom"
        )
    encapsulated = transfer_syntax in (RLE_LOSSLESS, JPEG_LOSSLESS_SV1,
                                       JPEG_LOSSLESS_P14)
    explicit = transfer_syntax != IMPLICIT_VR_LE

    pixel_tag = _DICT["PixelData"][:2]
    while pos + 8 <= len(buf):
        if encapsulated and pos + 4 <= len(buf) and struct.unpack_from(
            "<HH", buf, pos
        ) == pixel_tag:
            if not stop_before_pixels:
                frags = _read_encapsulated(buf, pos + 4)[0]
                if transfer_syntax == RLE_LOSSLESS:
                    ds._rle_fragments = frags
                else:
                    ds._jpeg_fragments = frags
            break
        tag, vr, raw, pos = _read_element(buf, pos, explicit)
        if tag == pixel_tag:
            if not stop_before_pixels and raw is not None:
                ds._pixel_data = bytes(raw)
            break
        if raw is None:
            continue  # skipped sequence
        if tag in _TAG_TO_KEYWORD:
            if not explicit:
                vr = _TAG_TO_VR[tag]
            ds._elements[tag] = _parse_value(vr, raw)
    return ds


# ---------------------------------------------------------------------------
# Writer — used to build fixtures and to export volumes as DICOM series.


def _encode_value(vr: str, value: Any) -> bytes:
    if vr in _STR_VRS or vr in ("DS", "IS"):
        if isinstance(value, (list, tuple)):
            s = "\\".join(_fmt_str(vr, v) for v in value)
        else:
            s = _fmt_str(vr, value)
        raw = s.encode("ascii")
        if len(raw) % 2:
            raw += b"\x00" if vr == "UI" else b" "
        return raw
    fmt = {"US": "<H", "SS": "<h", "UL": "<I", "SL": "<i",
           "FL": "<f", "FD": "<d"}.get(vr)
    if fmt is not None:
        vals = value if isinstance(value, (list, tuple)) else [value]
        return b"".join(struct.pack(fmt, v) for v in vals)
    raw = bytes(value)
    if len(raw) % 2:
        raw += b"\x00"
    return raw


def _fmt_str(vr: str, v: Any) -> str:
    if vr == "DS" and isinstance(v, float):
        return f"{v:.10g}"
    return str(v)


def _encode_element(group: int, elem: int, vr: str, value: Any) -> bytes:
    raw = _encode_value(vr, value)
    head = struct.pack("<HH", group, elem)
    if vr in _LONG_LEN_VRS:
        return head + vr.encode() + b"\x00\x00" + struct.pack("<I", len(raw)) + raw
    return head + vr.encode() + struct.pack("<H", len(raw)) + raw


def write_dicom(path: str, elements: dict[str, Any],
                pixel_data: Optional[np.ndarray] = None,
                rle: bool = False, jpeg_lossless: bool = False) -> None:
    """Write a Part-10 file from keyword->value elements.

    ``pixel_data`` is a (rows, cols) or (frames, rows, cols) integer array;
    Rows/Columns/BitsAllocated/PixelRepresentation/NumberOfFrames are derived
    from it when not given explicitly. ``rle=True`` writes RLE Lossless
    (encapsulated PackBits frames); ``jpeg_lossless=True`` writes JPEG
    Lossless SV1 (process 14) codestream frames instead of Explicit VR LE.
    """
    elements = dict(elements)
    if pixel_data is not None:
        pixel_data = np.asarray(pixel_data)
        if pixel_data.ndim == 3:
            elements.setdefault("NumberOfFrames", pixel_data.shape[0])
        rows, cols = pixel_data.shape[-2:]
        elements.setdefault("Rows", rows)
        elements.setdefault("Columns", cols)
        elements.setdefault("SamplesPerPixel", 1)
        elements.setdefault("PhotometricInterpretation", "MONOCHROME2")
        elements.setdefault("BitsAllocated", pixel_data.dtype.itemsize * 8)
        elements.setdefault("BitsStored", pixel_data.dtype.itemsize * 8)
        elements.setdefault("HighBit", pixel_data.dtype.itemsize * 8 - 1)
        elements.setdefault(
            "PixelRepresentation", 1 if pixel_data.dtype.kind == "i" else 0
        )

    meta = [
        ("MediaStorageSOPClassUID",
         elements.get("SOPClassUID", "1.2.840.10008.5.1.4.1.1.2")),
        ("MediaStorageSOPInstanceUID",
         elements.get("SOPInstanceUID", "1.2.3.4.5")),
        ("TransferSyntaxUID",
         RLE_LOSSLESS if rle
         else JPEG_LOSSLESS_SV1 if jpeg_lossless else EXPLICIT_VR_LE),
        ("ImplementationClassUID", "1.2.826.0.1.3680043.8.498.1"),
    ]
    meta_body = b"".join(
        _encode_element(*_DICT[kw][:2], _DICT[kw][2], v) for kw, v in meta
    )
    out = bytearray(b"\x00" * 128 + b"DICM")
    out += _encode_element(0x0002, 0x0000, "UL", len(meta_body))
    out += meta_body

    for kw in sorted(elements, key=lambda k: _DICT[k][:2]):
        g, e, vr = _DICT[kw]
        if g == 0x0002 or kw == "PixelData":
            continue
        out += _encode_element(g, e, vr, elements[kw])

    if pixel_data is not None:
        if rle or jpeg_lossless:
            frames = pixel_data if pixel_data.ndim == 3 else pixel_data[None]
            out += struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
            out += struct.pack("<I", 0xFFFFFFFF)
            out += struct.pack("<HHI", 0xFFFE, 0xE000, 0)  # empty BOT
            for fr in frames:
                if jpeg_lossless:
                    if fr.dtype.itemsize > 2:
                        raise InvalidDicomError(
                            "JPEG lossless supports at most 16-bit "
                            f"samples; got {fr.dtype} — use rle=True or "
                            "uncompressed for wider data"
                        )
                    bits = int(elements.get(
                        "BitsStored", fr.dtype.itemsize * 8
                    ))
                    frag = _jpeg_lossless_encode_frame(
                        np.asarray(fr).astype(np.int64) & 0xFFFF, bits
                    )
                else:
                    frag = _rle_encode_frame(fr)
                if len(frag) % 2:
                    frag += b"\x00"
                out += struct.pack("<HHI", 0xFFFE, 0xE000, len(frag)) + frag
            out += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
        else:
            raw = pixel_data.astype(
                pixel_data.dtype.newbyteorder("<")
            ).tobytes()
            if len(raw) % 2:
                raw += b"\x00"
            out += _encode_element(0x7FE0, 0x0010, "OW", raw)

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# Structure dump — the debug utility the reference exposes from its import
# dialog (`DCMTKLoader.cpp:67-82` DumpFileStructure, `:423-432`
# PrintDebugData).


def dump_file_structure(path: str, max_value_chars: int = 60) -> str:
    """Human-readable dump of every element in a Part-10 file.

    Unlike :func:`dcmread` (which keeps only dictionary tags), the dump walks
    ALL elements, printing tag, VR, length, keyword (when known) and a value
    preview — the `DumpFileStructure` equivalent (`DCMTKLoader.cpp:67-82`).
    """
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 132 + 8 or buf[128:132] != b"DICM":
        raise InvalidDicomError(f"{path}: missing DICM magic")
    lines = [f"# {path} ({len(buf)} bytes)"]
    pos = 132
    transfer_syntax = EXPLICIT_VR_LE
    explicit = True
    in_meta = True
    while pos + 8 <= len(buf):
        group = struct.unpack_from("<H", buf, pos)[0]
        if in_meta and group != 0x0002:
            in_meta = False
            explicit = transfer_syntax == EXPLICIT_VR_LE
            if transfer_syntax not in (IMPLICIT_VR_LE, EXPLICIT_VR_LE):
                lines.append(
                    f"... compressed transfer syntax {transfer_syntax}; "
                    "data set not walked"
                )
                break
        tag, vr, raw, pos = _read_element(buf, pos, explicit)
        kw = _TAG_TO_KEYWORD.get(tag, "?")
        if raw is None:
            preview, ln = "<sequence skipped>", "undef"
        else:
            ln = len(raw)
            if tag == (0x7FE0, 0x0010):
                head = " ".join(f"{b:02x}" for b in raw[:16])
                preview = f"<pixel data: {head} ...>"
            else:
                use_vr = vr if explicit or tag[0] == 0x0002 else \
                    _TAG_TO_VR.get(tag, "UN")
                try:
                    preview = repr(_parse_value(use_vr, raw))
                except Exception:
                    preview = raw[:16].hex()
                if len(preview) > max_value_chars:
                    preview = preview[: max_value_chars - 3] + "..."
            if tag == _DICT["TransferSyntaxUID"][:2]:
                transfer_syntax = _parse_value("UI", raw)
        lines.append(
            f"({tag[0]:04x},{tag[1]:04x}) {vr:2s} len={ln:>6} "
            f"{kw:28s} {preview}"
        )
        if tag == (0x7FE0, 0x0010):
            break
    return "\n".join(lines)
