"""One-time extraction of the ISO/IEC 11172-3 Layer III constant tables.

The MP3 Huffman code tables (Annex B.7) and scalefactor-band boundary tables
(Annex B.8) are pure spec data that every encoder/decoder carries verbatim.
Rather than hand-typing ~1,100 (code, length) entries (and risking silent
corruption), this script reads them out of the system LAME encoder binary
(`libmp3lame.so.0`, a stock Debian package): LAME's ``const huffcodetab
ht[34]`` has an unmistakable 24-byte-struct signature in ``.data.rel.ro``
(xlen/linmax ints + two R_X86_64_RELATIVE-relocated pointers), and the
``sfBandIndex[9]`` scalefactor structs start 0,4,8,... and end 576/192.

Output: ``native/mp3_tables.inc`` (committed), consumed by
``native/mp3dec.cpp``.  The generated file is DATA from the ISO spec, not
LAME code.  Re-run only if the .inc is lost:

    python scripts/extract_mp3_tables.py

The script verifies every extracted Huffman table is a complete prefix code
before writing anything.
"""

from __future__ import annotations

import struct
import sys

LIB = "/usr/lib/x86_64-linux-gnu/libmp3lame.so.0.0.0"
OUT = "native/mp3_tables.inc"

# (xlen-field, linmax) signature of lame's ht[34] (tables.c).  For ESC tables
# (16-31) lame stores LINBITS in the xlen field; count1 tables store 0.
# Tables 4 and 14 are unused (NULL pointers, no relocations).
HT_SIG = [
    (0, 0), (2, 0), (3, 0), (3, 0), (0, 0), (4, 0), (4, 0), (6, 0), (6, 0),
    (6, 0), (8, 0), (8, 0), (8, 0), (16, 0), (0, 0), (16, 0),
    (1, 1), (2, 3), (3, 7), (4, 15), (6, 63), (8, 255), (10, 1023), (13, 8191),
    (4, 15), (5, 31), (6, 63), (7, 127), (8, 255), (9, 511), (11, 2047), (13, 8191),
    (0, 0), (0, 0),
]
USED = [i for i in range(34) if i not in (0, 4, 14)]
# true table dimension (max x+1): pair tables are xlen*xlen entries, ESC
# tables are all 16x16, count1 tables are 16 quadruple entries
TRUE_XLEN = [0, 2, 3, 3, 0, 4, 4, 6, 6, 6, 8, 8, 8, 16, 0, 16] + [16] * 16 + [1, 1]
N_ENTRIES = [TRUE_XLEN[i] ** 2 if i < 32 else 16 for i in range(34)]
LINBITS = [0] * 16 + [1, 2, 3, 4, 6, 8, 10, 13, 4, 5, 6, 7, 8, 9, 11, 13, 0, 0]


class Elf:
    def __init__(self, path: str):
        self.data = open(path, "rb").read()
        d = self.data
        assert d[:4] == b"\x7fELF" and d[4] == 2, "need ELF64"
        e_shoff = struct.unpack_from("<Q", d, 0x28)[0]
        e_shentsize, e_shnum = struct.unpack_from("<HH", d, 0x3A)
        self.sections = []
        for i in range(e_shnum):
            off = e_shoff + i * e_shentsize
            name, typ, flags, addr, offset, size, link, info, align, entsize = \
                struct.unpack_from("<IIQQQQIIQQ", d, off)
            self.sections.append(dict(type=typ, addr=addr, offset=offset, size=size,
                                      entsize=entsize))

    def vaddr_to_off(self, v: int) -> int:
        for s in self.sections:
            if s["addr"] <= v < s["addr"] + s["size"] and s["type"] != 8:  # not NOBITS
                return s["offset"] + (v - s["addr"])
        raise ValueError(f"vaddr {v:#x} not mapped")

    def relative_relocs(self) -> dict[int, int]:
        """offset(vaddr) -> addend for R_X86_64_RELATIVE."""
        out = {}
        for s in self.sections:
            if s["type"] == 4:  # SHT_RELA
                for off in range(s["offset"], s["offset"] + s["size"], 24):
                    r_off, r_info, r_add = struct.unpack_from("<QQq", self.data, off)
                    if r_info & 0xFFFFFFFF == 8:  # R_X86_64_RELATIVE
                        out[r_off] = r_add
        return out


def find_ht(elf: Elf, relocs: dict[int, int]) -> list[tuple[list[int], list[int]]]:
    """Locate ht[34] and return [(codes, lens)] per table (empty for unused)."""
    d = elf.data
    # candidate base vaddrs: relocation at base+8 and base+16 for every used entry
    candidates = []
    for off in relocs:
        base = off - 24 - 8  # try: this reloc is entry 1's table ptr (entry 0 unused)
        ok = True
        for i, (xlen, linmax) in enumerate(HT_SIG):
            ent = base + 24 * i
            try:
                fo = elf.vaddr_to_off(ent)
            except ValueError:
                ok = False
                break
            got_x, got_lin = struct.unpack_from("<ii", d, fo)
            if (got_x, got_lin) != (xlen, linmax):
                ok = False
                break
            if (i in USED) != (ent + 8 in relocs and ent + 16 in relocs):
                ok = False
                break
        if ok:
            candidates.append(base)
    assert len(set(candidates)) == 1, f"ht[] signature matched {len(set(candidates))} places"
    base = candidates[0]
    tables = []
    for i in range(34):
        if i not in USED:
            tables.append(([], []))
            continue
        ent = base + 24 * i
        tab_ptr, len_ptr = relocs[ent + 8], relocs[ent + 16]
        n = N_ENTRIES[i]
        to, lo = elf.vaddr_to_off(tab_ptr), elf.vaddr_to_off(len_ptr)
        codes = list(struct.unpack_from(f"<{n}H", d, to))
        lens = list(d[lo:lo + n])
        # LAME's encoder tables bake sign-bit COUNTS into hlen (one per
        # nonzero x / y; per nonzero quadruple member for count1), and bake
        # sign-placeholder SHIFTS into the count1 HB codes.  Undo both to
        # recover the pure ISO (code, length) pairs.
        if i < 32:
            xlen = TRUE_XLEN[i]
            lens = [l - (x > 0) - (y > 0)
                    for (x, y), l in zip(((j // xlen, j % xlen) for j in range(n)), lens)]
        else:
            pops = [bin(j).count("1") for j in range(16)]
            codes = [c >> p for c, p in zip(codes, pops)]
            lens = [l - p for l, p in zip(lens, pops)]
        tables.append((codes, lens))
    return tables


def check_prefix_code(codes: list[int], lens: list[int], name: str) -> None:
    """Every (code, len) pair must form a complete, non-overlapping prefix code."""
    assert all(1 <= l <= 19 for l in lens), f"{name}: bad length"
    assert all(c < (1 << l) for c, l in zip(codes, lens)), f"{name}: code wider than length"
    # complete prefix code <=> the codes' dyadic intervals tile [0, 2^L)
    L = max(lens)
    ivals = sorted((c << (L - l), (c + 1) << (L - l)) for c, l in zip(codes, lens))
    pos = 0
    for a, b in ivals:
        assert a == pos, f"{name}: gap/overlap at {a} (expected {pos})"
        pos = b
    assert pos == 1 << L, f"{name}: incomplete code"


def find_sfb(elf: Elf) -> list[tuple[list[int], list[int]]]:
    """Locate lame's sfBandIndex[9]: {l[23], s[14], psfb21[7], psfb12[7]} ints."""
    d = elf.data
    rodatas = [s for s in elf.sections if s["type"] == 1 and s["size"] > 4096]
    hits = []
    for s in rodatas:
        data = d[s["offset"]:s["offset"] + s["size"]]
        for off in range(0, len(data) - 204 * 9, 4):
            vals = struct.unpack_from("<51i", data, off)
            l, sh = vals[:23], vals[23:37]
            if l[0] == 0 and l[22] == 576 and sh[0] == 0 and sh[13] == 192 \
                    and all(a < b for a, b in zip(l, l[1:])) \
                    and all(a < b for a, b in zip(sh, sh[1:])):
                hits.append((s["offset"] + off, list(l), list(sh)))
    # consecutive 204-byte entries starting at the first hit
    runs = [h for h in hits if all(any(h2[0] == h[0] + 204 * k for h2 in hits)
                                   for k in range(9))]
    assert runs, f"sfBandIndex run not found ({len(hits)} isolated hits)"
    start = runs[0][0]
    entries = [h for h in hits if (h[0] - start) % 204 == 0 and 0 <= (h[0] - start) // 204 < 9]
    entries.sort(key=lambda h: h[0])
    assert len(entries) == 9
    return [(l, sh) for _, l, sh in entries]


MPG123 = "/usr/lib/x86_64-linux-gnu/libmpg123.so.0.47.0"


def find_synth_window() -> list[int]:
    """ISO 11172-3 Table B.3 synthesis window D, half-table x 65536 (the
    values are exact multiples of 2^-16; mpg123 stores the 257-entry half as
    int64 `intwinbase`, center coefficient 75038)."""
    elf = Elf(MPG123)
    d = elf.data
    hits = []
    for s in elf.sections:
        if s["type"] != 1 or s["size"] < 2048:
            continue
        data = d[s["offset"]:s["offset"] + s["size"]]
        n = len(data) // 8
        vals = struct.unpack(f"<{n}q", data[:n * 8])
        for i in range(256, n):
            if vals[i] == 75038 and vals[i - 256] == 0:
                w = list(vals[i - 256:i + 1])
                if all(abs(v) <= 75038 for v in w) and w[1] == -1 and w[7] == -2:
                    hits.append(w)
    assert len(hits) == 1, f"intwinbase matched {len(hits)} places"
    return hits[0]


def main() -> None:
    elf = Elf(LIB)
    relocs = elf.relative_relocs()
    tables = find_ht(elf, relocs)
    for i, (codes, lens) in enumerate(tables):
        if codes:
            check_prefix_code(codes, lens, f"ht[{i}]")
    sfb = find_sfb(elf)
    # lame order (tables.c): 22050, 24000, 16000, 44100, 48000, 32000, 11025, 12000, 8000
    rates = [22050, 24000, 16000, 44100, 48000, 32000, 11025, 12000, 8000]
    # spot-check two tables known from the spec
    i441 = rates.index(44100)
    assert sfb[i441][0][:8] == [0, 4, 8, 12, 16, 20, 24, 30], "44.1k long sfb mismatch"
    i48 = rates.index(48000)
    assert sfb[i48][0][-3:] == [330, 384, 576], "48k long sfb mismatch"

    lines = [
        "// GENERATED by scripts/extract_mp3_tables.py — DO NOT EDIT.",
        "// ISO/IEC 11172-3 Annex B.7 Huffman code tables and B.8 scalefactor",
        "// band boundaries (pure spec data, extracted from the system LAME",
        "// binary's ht[]/sfBandIndex[] and verified as complete prefix codes).",
        "",
        "// Per big-values table: xlen (0 = unused), linbits.",
    ]
    lines.append("static const unsigned char kHuffXlen[34] = {")
    lines.append("    " + ", ".join(str(x) for x in TRUE_XLEN) + "};")
    lines.append("static const unsigned char kHuffLinbits[34] = {")
    lines.append("    " + ", ".join(str(b) for b in LINBITS) + "};")
    for i, (codes, lens) in enumerate(tables):
        if not codes:
            continue
        # tables 17-23 and 25-31 alias 16 / 24 in lame; skip duplicates
        if 17 <= i <= 23 or 25 <= i <= 31:
            continue
        lines.append(f"static const unsigned short kHuffCodes{i}[{len(codes)}] = {{")
        for j in range(0, len(codes), 12):
            lines.append("    " + ", ".join(str(c) for c in codes[j:j + 12]) + ",")
        lines.append("};")
        lines.append(f"static const unsigned char kHuffLens{i}[{len(lens)}] = {{")
        for j in range(0, len(lens), 20):
            lines.append("    " + ", ".join(str(c) for c in lens[j:j + 20]) + ",")
        lines.append("};")
    lines.append("struct HuffTabRef { const unsigned short* codes; const unsigned char* lens; };")
    refs = []
    for i in range(34):
        if not TRUE_XLEN[i]:
            refs.append("{nullptr, nullptr}")
        else:
            src = 16 if 16 <= i <= 23 else 24 if 24 <= i <= 31 else i
            refs.append(f"{{kHuffCodes{src}, kHuffLens{src}}}")
    lines.append("static const HuffTabRef kHuffTabs[34] = {")
    for j in range(0, 34, 4):
        lines.append("    " + ", ".join(refs[j:j + 4]) + ",")
    lines.append("};")
    lines.append("")
    lines.append("// Scalefactor band boundaries: long[23] then short[14], per sample rate.")
    lines.append("// Row order: 44100, 48000, 32000, 22050, 24000, 16000, 11025, 12000, 8000.")
    order = [44100, 48000, 32000, 22050, 24000, 16000, 11025, 12000, 8000]
    lines.append("static const int kSfbRates[9] = {" + ", ".join(map(str, order)) + "};")
    lines.append("static const short kSfbLong[9][23] = {")
    for r in order:
        l, _ = sfb[rates.index(r)]
        lines.append("    {" + ", ".join(map(str, l)) + "},")
    lines.append("};")
    lines.append("static const short kSfbShort[9][14] = {")
    for r in order:
        _, sh = sfb[rates.index(r)]
        lines.append("    {" + ", ".join(map(str, sh)) + "},")
    lines.append("};")
    lines.append("")
    win = find_synth_window()
    lines.append("// ISO Table B.3 synthesis window D x 65536, half-table (257 of 512;")
    lines.append("// the full window is mirrored in code).")
    lines.append("static const int kSynthWinHalf[257] = {")
    for j in range(0, 257, 10):
        lines.append("    " + ", ".join(str(v) for v in win[j:j + 10]) + ",")
    lines.append("};")
    lines.append("")
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    n_codes = sum(len(c) for c, _ in tables)
    print(f"wrote {OUT}: {n_codes} huffman entries, 9 sfb rows — all prefix-code checks passed")


if __name__ == "__main__":
    sys.exit(main())
