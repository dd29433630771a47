// Shared declarations for the native audio decoders (compiled together with
// audioio.cpp into libaudioio.so by f5_tts_tpu/audio/native_loader.py).
#pragma once

#include <cstdint>
#include <vector>

// MPEG-1/2/2.5 Layer III (native/mp3dec.cpp).  Decodes the whole stream to
// mono float PCM in [-1, 1]; returns false on unrecoverable parse failure.
bool mp3_decode_stream(const uint8_t* data, size_t size, std::vector<float>& mono,
                       int* sample_rate);

// FLAC (native/flacdec.cpp).
bool flac_decode_stream(const uint8_t* data, size_t size, std::vector<float>& mono,
                        int* sample_rate);
