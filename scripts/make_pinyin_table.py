"""Generate a char->pinyin(TONE3) table file for the offline G2P backend.

Run this once in any environment that has pypinyin installed:

    python scripts/make_pinyin_table.py > pinyin_table.tsv
    export F5_TTS_TPU_PINYIN_TABLE=$PWD/pinyin_table.tsv

The table covers CJK codepoints with their default (most frequent) reading;
tone sandhi still requires pypinyin at runtime (exact reference parity), the
table backend is the documented fallback (see f5_tts_tpu/text/pinyin.py).
"""

import sys


def main():
    try:
        from pypinyin import Style, pinyin
    except ImportError:
        sys.exit("pypinyin is required to build the table: pip install pypinyin")

    for cp in range(0x3100, 0xA000):
        ch = chr(cp)
        out = pinyin(ch, style=Style.TONE3, errors=lambda x: None)
        if out and out[0] and out[0][0]:
            py = out[0][0]
            if py != ch:
                sys.stdout.write(f"{ch}\t{py}\n")


if __name__ == "__main__":
    main()
