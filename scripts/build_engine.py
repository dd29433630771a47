"""Build AOT serving artifacts — thin shim over f5_tts_tpu.runtime.aot:main
(also installed as the `f5-tts_build-engine` console script).

    python scripts/build_engine.py --out artifacts/ \
        --model F5TTS_v1_Base --ckpt model.safetensors --vocoder vocos.bin \
        --batches 1 2 --buckets 1024 --ref-buckets 512 --platforms tpu
"""

import sys

sys.path.insert(0, ".")

from f5_tts_tpu.runtime.aot import main

if __name__ == "__main__":
    main()
