"""
BCF2 (binary VCF) reading.

Layout (SAM/VCF spec section 6): BGZF-compressed stream starting with magic
``BCF\\2\\x02``, a text VCF header, then records of typed binary values.
"""

import struct
from typing import Iterator, List, Optional, Tuple

from .bgzf import BGZFReader
from . import vcflib


def _read_typed_descriptor(buf, off) -> Tuple[int, int, int]:
    """Return (type, length, new_offset)."""
    b = buf[off]
    off += 1
    typ = b & 0x0F
    length = b >> 4
    if length == 15:
        # length given as a following typed integer
        val, off = _read_typed_value_scalar(buf, off)
        length = val
    return typ, length, off


def _read_typed_value_scalar(buf, off):
    typ, length, off = _read_typed_descriptor(buf, off)
    assert length == 1
    return _read_scalar(buf, off, typ)


def _read_scalar(buf, off, typ):
    if typ == 1:
        return struct.unpack_from("<b", buf, off)[0], off + 1
    if typ == 2:
        return struct.unpack_from("<h", buf, off)[0], off + 2
    if typ == 3:
        return struct.unpack_from("<i", buf, off)[0], off + 4
    if typ == 5:
        return struct.unpack_from("<f", buf, off)[0], off + 4
    raise ValueError(f"unsupported BCF scalar type {typ}")


_INT_MISSING = {1: -128, 2: -32768, 3: -2147483648}
_INT_EOV = {1: -127, 2: -32767, 3: -2147483647}


def _read_typed(buf, off):
    """Read one typed value (scalar, vector, or string)."""
    typ, length, off = _read_typed_descriptor(buf, off)
    if typ == 0:
        return None, off
    if typ == 7:  # char string
        s = buf[off : off + length].decode()
        return s, off + length
    vals = []
    for _ in range(length):
        v, off = _read_scalar(buf, off, typ)
        if typ in _INT_MISSING and v == _INT_MISSING[typ]:
            v = None
        vals.append(v)
    if length == 1:
        return vals[0], off
    return vals, off


class BCFParser:
    def __init__(self, path: str):
        self._reader = BGZFReader(path)
        magic = self._reader.read(5)
        if magic[:3] != b"BCF":
            raise vcflib.VcfFormatError("not a BCF file")
        (l_text,) = struct.unpack("<I", self._reader.read(4))
        text = self._reader.read(l_text).rstrip(b"\x00").decode()
        lines = text.splitlines()
        self.header = vcflib.VariantHeader.parse([ln + "\n" for ln in lines])
        # IDX-aware string dictionary: FILTER/INFO/FORMAT ids by index
        self._dict: List[str] = []
        idx_map = {}
        n = 0
        for ln in lines:
            m = vcflib._HEADER_STRUCTURED_RE.match(ln)
            if not m:
                continue
            kind = m.group(1)
            if kind not in ("FILTER", "INFO", "FORMAT"):
                continue
            fields = vcflib._split_structured(m.group(2))
            ident = fields.get("ID")
            if ident in idx_map:
                continue
            if "IDX" in fields:
                idx_map[ident] = int(fields["IDX"])
            else:
                idx_map[ident] = n
                n += 1
        if "PASS" not in idx_map:
            idx_map["PASS"] = 0
        size = max(idx_map.values()) + 1 if idx_map else 0
        self._dict = [""] * size
        for ident, i in idx_map.items():
            if i < size:
                self._dict[i] = ident
        self._contigs = list(self.header.contigs)

    def __iter__(self) -> Iterator[vcflib.VariantRecord]:
        while True:
            head = self._reader.read(8)
            if len(head) < 8:
                return
            l_shared, l_indiv = struct.unpack("<II", head)
            shared = self._reader.read(l_shared)
            indiv = self._reader.read(l_indiv)
            if len(shared) < l_shared:
                return
            yield self._parse_record(shared, indiv)

    def _parse_record(self, shared: bytes, indiv: bytes) -> vcflib.VariantRecord:
        rec = vcflib.VariantRecord(self.header)
        (chrom_idx, pos, _rlen) = struct.unpack_from("<iii", shared, 0)
        (qual,) = struct.unpack_from("<f", shared, 12)
        (n_allele_info,) = struct.unpack_from("<I", shared, 16)
        (n_fmt_sample,) = struct.unpack_from("<I", shared, 20)
        n_allele = n_allele_info >> 16
        n_info = n_allele_info & 0xFFFF
        n_fmt = n_fmt_sample >> 24
        n_sample = n_fmt_sample & 0xFFFFFF
        off = 24
        rec.chrom = self._contigs[chrom_idx]
        rec.pos = pos + 1
        if qual == qual and struct.pack("<f", qual) != b"\x01\x00\x80\x7f":
            rec.qual = float(qual)
        else:
            rec.qual = None
        vid, off = _read_typed(shared, off)
        rec.id = vid if vid else None
        alleles = []
        for _ in range(n_allele):
            a, off = _read_typed(shared, off)
            alleles.append(a)
        rec.ref = alleles[0] if alleles else ""
        rec.alts = tuple(alleles[1:]) if len(alleles) > 1 else None
        filt, off = _read_typed(shared, off)
        if filt is None:
            rec.filter = "."
        else:
            ids = filt if isinstance(filt, list) else [filt]
            rec.filter = ";".join(self._dict[i] for i in ids) or "."
        info_parts = []
        for _ in range(n_info):
            key_idx, off = _read_typed_value_scalar(shared, off)
            val, off = _read_typed(shared, off)
            key = self._dict[key_idx]
            if val is None:
                info_parts.append(key)
            elif isinstance(val, list):
                info_parts.append(
                    f"{key}={','.join('.' if v is None else _fmt(v) for v in val)}"
                )
            else:
                info_parts.append(f"{key}={_fmt(val)}")
        rec.set_info_raw(";".join(info_parts) if info_parts else ".")

        # FORMAT / per-sample values
        off = 0
        names = self.header.samples
        per_sample = [dict() for _ in names]
        fmt_keys = []
        for _ in range(n_fmt):
            key_idx, off = _read_typed_value_scalar(indiv, off)
            key = self._dict[key_idx]
            typ, length, off = _read_typed_descriptor(indiv, off)
            fmt_keys.append(key)
            for s in range(n_sample):
                if typ == 7:
                    raw = indiv[off : off + length].decode().rstrip("\x00")
                    off += length
                    per_sample[s][key] = raw if raw else "."
                else:
                    vals = []
                    for _i in range(length):
                        v, off = _read_scalar(indiv, off, typ)
                        vals.append((typ, v))
                    if key == "GT":
                        per_sample[s][key] = _decode_gt(vals)
                    else:
                        out = []
                        for typ_i, v in vals:
                            if typ_i in _INT_EOV and v == _INT_EOV[typ_i]:
                                continue  # end of vector
                            if typ_i in _INT_MISSING and v == _INT_MISSING[typ_i]:
                                out.append(".")
                            elif typ_i == 5 and v != v:
                                out.append(".")
                            else:
                                out.append(_fmt(v))
                        per_sample[s][key] = ",".join(out) if out else "."
        rec.format = fmt_keys
        calls = [vcflib.VariantRecordSample(rec, values) for values in per_sample]
        rec.samples = vcflib._SampleMap(list(names), calls)
        return rec


def _decode_gt(vals) -> str:
    parts = []
    phased_next = False
    out = []
    for i, (typ, v) in enumerate(vals):
        if typ in _INT_EOV and v == _INT_EOV[typ]:
            break
        if typ in _INT_MISSING and v == _INT_MISSING[typ]:
            allele = "."
            sep = "/"
        else:
            allele = str((v >> 1) - 1) if (v >> 1) >= 1 else "."
            sep = "|" if (v & 1) else "/"
        if i == 0:
            out.append(allele)
        else:
            out.append(sep + allele)
    return "".join(out) if out else "."


def _fmt(v) -> str:
    if isinstance(v, float):
        if v == int(v):
            return str(int(v))
        return f"{v:g}"
    return str(v)
