"""f5-tts_finetune-cli — finetuning CLI (reference src/f5_tts/train/finetune_cli.py:81-210).

Same flag surface minus the HF auto-download: --pretrain points at a local
released checkpoint (.pt/.safetensors/.npz); it is snapshotted into the run's
ckpt dir as ``pretrained_<name>`` (excluded from rotation) exactly like the
reference (:141-151).
"""

from __future__ import annotations

import argparse
import os
import shutil

import jax


def main(argv=None):
    # serving/train graphs cost minutes of XLA compile; make restarts
    # cache-hits from a durable location (utils/compile_cache.py)
    from f5_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(prog="f5-tts_finetune-cli")
    from f5_tts_tpu.models.configs import MODEL_CONFIGS as _MC

    # reference offers its three shipped archs; the small/tiny configs are
    # also accepted here (cheap smoke finetunes, CI walkthroughs)
    p.add_argument("--exp_name", type=str, default="F5TTS_v1_Base",
                   choices=sorted(_MC.keys()))
    p.add_argument("--dataset_name", type=str, default="my_speak")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--pretrain", type=str, default=None, help="local pretrained ckpt path")
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--batch_size_per_gpu", type=int, default=3200)
    p.add_argument("--batch_size_type", type=str, default="frame", choices=["frame", "sample"])
    p.add_argument("--max_samples", type=int, default=64)
    p.add_argument("--grad_accumulation_steps", type=int, default=1)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--num_warmup_updates", type=int, default=20000)
    p.add_argument("--save_per_updates", type=int, default=50000)
    p.add_argument("--keep_last_n_checkpoints", type=int, default=-1)
    p.add_argument("--last_per_updates", type=int, default=5000)
    p.add_argument("--finetune", action="store_true", default=True)
    p.add_argument("--tokenizer", type=str, default=None, choices=[None, "pinyin", "char", "custom"])
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--logger", type=str, default=None, choices=[None, "wandb", "tensorboard"])
    p.add_argument("--export_safetensors", type=str, default=None,
                   help="write the final EMA weights as a reference-format .safetensors")
    args = p.parse_args(argv)

    from f5_tts_tpu.models.backbones import get_backbone
    from f5_tts_tpu.models.configs import MODEL_CONFIGS, with_vocab_size
    from f5_tts_tpu.text.tokenizer import get_tokenizer
    from f5_tts_tpu.train.dataset import load_dataset
    from f5_tts_tpu.train.step import OptimConfig
    from f5_tts_tpu.train.trainer import Trainer
    from f5_tts_tpu.utils import ckpt as ckpt_util

    model_cfg = MODEL_CONFIGS[args.exp_name]
    tokenizer = args.tokenizer or model_cfg.tokenizer
    vocab_src = args.tokenizer_path if tokenizer == "custom" else args.dataset_name
    vocab, vocab_size = get_tokenizer(vocab_src, tokenizer)
    model_cfg = with_vocab_size(model_cfg, vocab_size)

    ckpt_dir = os.path.join("ckpts", args.dataset_name)
    os.makedirs(ckpt_dir, exist_ok=True)

    backbone = get_backbone(model_cfg.arch)
    if args.pretrain:
        # snapshot pretrained weights into the run dir (reference :141-151)
        dst = os.path.join(ckpt_dir, f"pretrained_{os.path.basename(args.pretrain)}")
        if not os.path.exists(dst):
            shutil.copy2(args.pretrain, dst)
        if args.pretrain.endswith(".npz"):
            template = backbone.init(jax.random.PRNGKey(0), model_cfg.arch)
            params = ckpt_util.load_pytree(template, dst)
        else:
            state = ckpt_util.load_torch_state(dst)
            params = ckpt_util.params_from_state(state, model_cfg.arch)
        # extended vocab: grow the embedding table (reference expand_model_embeddings)
        params = ckpt_util.expand_text_embedding(params, vocab_size)
    else:
        params = backbone.init(jax.random.PRNGKey(0), model_cfg.arch)

    dataset = load_dataset(args.dataset_name, tokenizer, mel_cfg=model_cfg.mel,
                           data_root=args.data_root)
    trainer = Trainer(
        model_cfg,
        vocab,
        OptimConfig(
            learning_rate=args.learning_rate,
            num_warmup_updates=args.num_warmup_updates,
            max_grad_norm=args.max_grad_norm,
        ),
        ckpt_dir=ckpt_dir,
        batch_size_per_device=args.batch_size_per_gpu,
        batch_size_type=args.batch_size_type,
        max_samples=args.max_samples,
        grad_accumulation_steps=args.grad_accumulation_steps,
        save_per_updates=args.save_per_updates,
        keep_last_n_checkpoints=args.keep_last_n_checkpoints,
        last_per_updates=args.last_per_updates,
        logger=args.logger,
    )
    params, ema_params, update = trainer.train(params, dataset, epochs=args.epochs, resume=True)
    if args.export_safetensors:
        from f5_tts_tpu.models.configs import DiTConfig

        if isinstance(model_cfg.arch, DiTConfig):
            ckpt_util.export_safetensors(ema_params, model_cfg.arch, args.export_safetensors)
            print(f"exported EMA weights -> {args.export_safetensors}")
        else:
            print("--export_safetensors currently supports DiT backbones only")


if __name__ == "__main__":
    main()
