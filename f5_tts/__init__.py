"""Drop-in import-path compatibility with the reference `f5_tts` package.

Users migrating from SWivid/F5-TTS keep their import paths:

    from f5_tts.api import F5TTS
    from f5_tts.infer.utils_infer import chunk_text, infer_process
    from f5_tts.model.utils import convert_char_to_pinyin, get_tokenizer

Everything resolves to the TPU-native implementations in `f5_tts_tpu`.
"""
