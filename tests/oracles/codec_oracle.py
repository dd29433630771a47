"""Offline mp3/flac codec oracles via the stock system codec libraries.

- ``lame_encode_mp3``: synthesize mp3 fixtures from PCM with libmp3lame
  (any MPEG-1/2/2.5 rate, mono/stereo, CBR/VBR) — the image has no ffmpeg,
  but LAME is the reference encoder the Emilia corpus itself was made with.
- ``mpg123_decode``: decode mp3 to float PCM with libmpg123 (gapless
  disabled so the output is the raw full-frame stream, comparable
  sample-for-sample with native/mp3dec.cpp).
- ``sdl_decode`` (flac or anything SDL_mixer handles): decode via pygame's
  bundled SDL_mixer at the file's native rate.

These are TEST oracles only — the runtime decode path is the repo's own
native/mp3dec.cpp / native/flacdec.cpp.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LAME = "/usr/lib/x86_64-linux-gnu/libmp3lame.so.0"
_MPG123 = "/usr/lib/x86_64-linux-gnu/libmpg123.so.0"


def available() -> bool:
    return os.path.exists(_LAME) and os.path.exists(_MPG123)


def lame_encode_mp3(pcm: np.ndarray, sample_rate: int, bitrate: int = 128,
                    vbr: bool = False, quality: int = 5) -> bytes:
    """Encode float PCM [-1,1] (1-D mono or [n, 2] stereo) to an mp3 stream."""
    lame = ctypes.CDLL(_LAME)
    lame.lame_init.restype = ctypes.c_void_p
    gfp = ctypes.c_void_p(lame.lame_init())
    assert gfp
    pcm = np.asarray(pcm, np.float32)
    stereo = pcm.ndim == 2
    n = pcm.shape[0]
    nch = 2 if stereo else 1
    lame.lame_set_in_samplerate(gfp, sample_rate)
    lame.lame_set_out_samplerate(gfp, sample_rate)
    lame.lame_set_num_channels(gfp, nch)
    lame.lame_set_mode(gfp, 1 if stereo else 3)  # 1=joint stereo, 3=mono
    lame.lame_set_bWriteVbrTag(gfp, 1)
    if vbr:
        lame.lame_set_VBR(gfp, 4)  # vbr_default (mtrh)
    else:
        lame.lame_set_VBR(gfp, 0)
        lame.lame_set_brate(gfp, bitrate)
    lame.lame_set_quality(gfp, quality)
    assert lame.lame_init_params(gfp) >= 0
    s16 = np.clip(pcm * 32767.0, -32768, 32767).astype(np.int16)
    left = np.ascontiguousarray(s16[:, 0] if stereo else s16)
    right = np.ascontiguousarray(s16[:, 1]) if stereo else left
    buf = ctypes.create_string_buffer(int(1.25 * n + 7200 + 16384))
    m = lame.lame_encode_buffer(
        gfp, left.ctypes.data_as(ctypes.c_void_p), right.ctypes.data_as(ctypes.c_void_p),
        n, buf, len(buf))
    assert m >= 0, f"lame_encode_buffer: {m}"
    out = bytes(buf[:m])
    m = lame.lame_encode_flush(gfp, buf, len(buf))
    assert m >= 0
    out += bytes(buf[:m])
    # lame_get_lametag_frame rewrites the Xing header in place at the stream
    # start; fetch it so duration metadata is consistent.
    try:
        lame.lame_get_lametag_frame.restype = ctypes.c_size_t
        tag = ctypes.create_string_buffer(16384)
        tn = lame.lame_get_lametag_frame(gfp, tag, len(tag))
        if 0 < tn <= len(out):
            out = bytes(tag[:tn]) + out[tn:]
    except Exception:
        pass
    lame.lame_close(gfp)
    return out


# mpg123 parameter/flag constants (mpg123.h enums, stable public ABI)
_MPG123_FLAGS = 1
_MPG123_REMOVE_FLAGS = 13
_MPG123_GAPLESS = 0x40
_MPG123_ENC_FLOAT_32 = 0x200


def mpg123_decode(path: str, gapless: bool = False) -> tuple[np.ndarray, int]:
    """Decode an mp3 file to float32 PCM [n, ch] at its native rate."""
    lib = ctypes.CDLL(_MPG123)
    lib.mpg123_init()
    lib.mpg123_new.restype = ctypes.c_void_p
    lib.mpg123_new.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
    err = ctypes.c_int(0)
    h = ctypes.c_void_p(lib.mpg123_new(None, ctypes.byref(err)))
    assert h, f"mpg123_new: {err.value}"
    lib.mpg123_param.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_long, ctypes.c_double]
    if not gapless:
        lib.mpg123_param(h, _MPG123_REMOVE_FLAGS, _MPG123_GAPLESS, 0.0)
    # force float32 output for every rate/channel count BEFORE open (format
    # changes only apply to the next track)
    lib.mpg123_format_none.argtypes = [ctypes.c_void_p]
    lib.mpg123_format_none(h)
    lib.mpg123_format.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int]
    for r in [8000, 11025, 12000, 16000, 22050, 24000, 32000, 44100, 48000]:
        assert lib.mpg123_format(h, r, 3, _MPG123_ENC_FLOAT_32) == 0  # 3 = mono|stereo
    lib.mpg123_open.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    assert lib.mpg123_open(h, path.encode()) == 0
    rate = ctypes.c_long(0)
    ch = ctypes.c_int(0)
    enc = ctypes.c_int(0)
    lib.mpg123_getformat.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
                                     ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    assert lib.mpg123_getformat(h, ctypes.byref(rate), ctypes.byref(ch), ctypes.byref(enc)) == 0
    assert enc.value == _MPG123_ENC_FLOAT_32, f"format not applied: enc={enc.value:#x}"
    chunks = []
    buf = ctypes.create_string_buffer(1 << 18)
    done = ctypes.c_size_t(0)
    lib.mpg123_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                                ctypes.POINTER(ctypes.c_size_t)]
    while True:
        r = lib.mpg123_read(h, buf, len(buf), ctypes.byref(done))
        if done.value:
            chunks.append(np.frombuffer(buf.raw[:done.value], np.float32).copy())
        if r != 0:  # MPG123_OK=0; MPG123_DONE=-12, NEW_FORMAT=1 handled by preset format
            if r == 1:
                continue
            break
    lib.mpg123_close(h)
    lib.mpg123_delete.argtypes = [ctypes.c_void_p]
    lib.mpg123_delete(h)
    pcm = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    return pcm.reshape(-1, ch.value), int(rate.value)


def sdl_decode(path: str, rate: int, channels: int = 1) -> np.ndarray:
    """Decode any SDL_mixer-supported file (flac, mp3, ogg, wav) at `rate`."""
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    import pygame
    pygame.mixer.quit()
    pygame.mixer.init(frequency=rate, size=-16, channels=channels)
    s = pygame.mixer.Sound(path)
    raw = np.frombuffer(s.get_raw(), dtype=np.int16).astype(np.float32) / 32768.0
    return raw.reshape(-1, channels) if channels > 1 else raw
