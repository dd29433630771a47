# TPU deployment image (reference ships a CUDA torch image + a Triton server
# image; the TPU equivalent is one image with libtpu-enabled jax).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY pyproject.toml README.md ./
COPY f5_tts_tpu ./f5_tts_tpu
COPY native ./native
COPY scripts ./scripts
COPY configs ./configs

# jax[tpu] pulls libtpu for Cloud TPU VMs; CPU fallback works for dev
RUN pip install --no-cache-dir -e .[train] "jax[tpu]" \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir jieba pypinyin

EXPOSE 8000 9998
ENTRYPOINT ["f5-tts_http-server"]
