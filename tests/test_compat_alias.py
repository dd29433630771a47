"""Reference import-path compatibility (`import f5_tts...` keeps working)."""


def test_reference_import_paths():
    from f5_tts.api import F5TTS
    from f5_tts.infer.utils_infer import chunk_text, infer_process, nfe_step, preprocess_ref_audio_text
    from f5_tts.model.dataset import CustomDataset, DynamicBatchSampler, load_dataset
    from f5_tts.model.utils import convert_char_to_pinyin, get_tokenizer, seed_everything

    assert F5TTS.__name__ == "F5TTS"
    assert nfe_step == 32
    assert chunk_text("a. b.", max_chars=100) == ["a. b."]
    vocab, size = get_tokenizer(None, "pinyin")
    assert size == 2545
    out = convert_char_to_pinyin(["hi there"])
    assert isinstance(out[0], list)


def test_reference_entrypoint_aliases():
    from f5_tts.infer.infer_cli import main as infer_main
    from f5_tts.socket_server import TTSStreamingProcessor, start_server
    from f5_tts.train.finetune_cli import main as ft_main
    from f5_tts.train.train import main as train_main

    assert callable(infer_main) and callable(train_main) and callable(ft_main)
    assert callable(start_server)
