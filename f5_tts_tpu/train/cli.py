"""f5-tts_train — pretraining CLI (reference src/f5_tts/train/train.py).

Reads the same YAML schema as the reference configs/*.yaml (without hydra —
stdlib-parseable subset) or a named builtin config, then runs the Trainer.
"""

from __future__ import annotations

import argparse

import jax


def parse_simple_yaml(path: str) -> dict:
    """Minimal YAML subset parser (nested maps, scalars) — enough for the
    reference config schema; avoids a yaml dependency."""
    root: dict = {}
    stack: list[tuple[int, dict]] = [(-1, root)]
    with open(path, "r", encoding="utf-8") as f:
        for raw in f:
            line = raw.split("#", 1)[0].rstrip()
            if not line.strip():
                continue
            indent = len(line) - len(line.lstrip())
            key, _, val = line.strip().partition(":")
            val = val.strip()
            while stack and stack[-1][0] >= indent:
                stack.pop()
            parent = stack[-1][1]
            if not val:
                child: dict = {}
                parent[key] = child
                stack.append((indent, child))
            else:
                parent[key] = _scalar(val)
    return root


def _scalar(v: str):
    low = v.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "none", "~"):
        return None
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    return v.strip("'\"")


def apply_overrides(cfg: dict, overrides: list[str]) -> dict:
    """Hydra-style dotted overrides over the parsed config dict, in place.

    Accepts ``section.key=value`` and ``++section.key=value`` (both set or
    create the key — the reference's hydra CLI uses ``++`` for keys absent
    from the base config, src/f5_tts/train/README.md:45-53).  Values parse
    with the same scalar rules as the YAML subset; ``[a,b,c]`` parses to a
    list of scalars.  Every config key is reachable without a dedicated flag.
    """
    for item in overrides:
        spec = item[2:] if item.startswith("++") else item
        path, eq, raw = spec.partition("=")
        if not eq or "." not in path:
            raise SystemExit(
                f"bad override {item!r}: expected [++]section.key=value")
        value = ([_scalar(x.strip()) for x in raw[1:-1].split(",") if x.strip()]
                 if raw.startswith("[") and raw.endswith("]") else _scalar(raw))
        node = cfg
        keys = path.split(".")
        for k in keys[:-1]:
            nxt = node.get(k)
            if not isinstance(nxt, dict):
                nxt = {}
                node[k] = nxt
            node = nxt
        node[keys[-1]] = value
    return cfg


def main(argv=None):
    # serving/train graphs cost minutes of XLA compile; make restarts
    # cache-hits from a durable location (utils/compile_cache.py)
    from f5_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(prog="f5-tts_train")
    p.add_argument("--config", type=str, help="YAML config (reference schema)")
    p.add_argument("--model", type=str, default="F5TTS_v1_Base", help="builtin config name")
    p.add_argument("--dataset_name", type=str, default="Emilia_ZH_EN")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--ckpt_dir", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--batch_size_per_gpu", type=int, default=None)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--num_warmup_updates", type=int, default=None)
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="Megatron TP degree (mesh 'model' axis)")
    p.add_argument("--pipeline_parallel", type=int, default=1,
                   help="pipeline stages over the DiT depth (mesh 'pipe' axis)")
    p.add_argument("--pipeline_microbatches", type=int, default=0,
                   help="GPipe microbatches (default 4x pipeline stages)")
    p.add_argument("--sequence_parallel", type=int, default=1,
                   help="context-parallel degree over mel frames (mesh 'seq' axis)")
    p.add_argument("--zero1", action="store_true",
                   help="shard optimizer state over the data axis (ZeRO-1)")
    p.add_argument("--pretrain", type=str, default=None, help="init weights (pt/safetensors/npz)")
    p.add_argument("overrides", nargs="*", metavar="[++]section.key=value",
                   help="hydra-style dotted config overrides applied over the "
                        "YAML/builtin config (e.g. ++datasets.batch_size_per_gpu=19200 "
                        "model.arch.depth=18 optim.mixed_precision=true)")
    args = p.parse_args(argv)

    from f5_tts_tpu.models.backbones import get_backbone
    from f5_tts_tpu.models.configs import (MODEL_CONFIGS, from_yaml_dict, to_yaml_dict,
                                           with_vocab_size)
    from f5_tts_tpu.text.tokenizer import get_tokenizer
    from f5_tts_tpu.train.dataset import load_dataset
    from f5_tts_tpu.train.step import OptimConfig
    from f5_tts_tpu.train.trainer import Trainer
    from f5_tts_tpu.utils import ckpt as ckpt_util

    ycfg = parse_simple_yaml(args.config) if args.config else {}
    if args.overrides:
        # model.* overrides need a model section to land on; materialize the
        # builtin config so dotted overrides work without a YAML file too
        if "model" not in ycfg and any(
                o.lstrip("+").startswith("model.") for o in args.overrides):
            ycfg["model"] = to_yaml_dict(MODEL_CONFIGS[args.model])
        apply_overrides(ycfg, args.overrides)
    model_section = ycfg.get("model", {})
    model_cfg = from_yaml_dict(model_section) if model_section else MODEL_CONFIGS[args.model]
    optim = ycfg.get("optim", {})
    datasets_cfg = ycfg.get("datasets", {})
    ckpts_cfg = ycfg.get("ckpts", {})

    dataset_name = datasets_cfg.get("name", args.dataset_name)
    vocab, vocab_size = get_tokenizer(dataset_name, model_cfg.tokenizer)
    model_cfg = with_vocab_size(model_cfg, vocab_size)

    epochs = args.epochs or optim.get("epochs", 11)
    opt_cfg = OptimConfig(
        learning_rate=args.learning_rate or optim.get("learning_rate", 7.5e-5),
        num_warmup_updates=args.num_warmup_updates or optim.get("num_warmup_updates", 20_000),
        max_grad_norm=optim.get("max_grad_norm", 1.0),
        grad_accumulation_steps=optim.get("grad_accumulation_steps", 1),
        mixed_precision=optim.get("mixed_precision", False),
    )

    dataset = load_dataset(dataset_name, model_cfg.tokenizer, mel_cfg=model_cfg.mel,
                           data_root=args.data_root)

    n_dev = len(jax.devices())
    par = args.tensor_parallel * args.pipeline_parallel * args.sequence_parallel
    if n_dev > 1:
        from f5_tts_tpu.parallel.mesh import make_train_mesh

        mesh = make_train_mesh(
            data=n_dev // par, model=args.tensor_parallel,
            pipe=args.pipeline_parallel, seq=args.sequence_parallel,
        )
    else:
        mesh = None
    n_micro = args.pipeline_microbatches or (
        4 * args.pipeline_parallel if args.pipeline_parallel > 1 else 0
    )

    trainer = Trainer(
        model_cfg,
        vocab,
        opt_cfg,
        ckpt_dir=args.ckpt_dir or ckpts_cfg.get("save_dir", f"ckpts/{model_cfg.name}"),
        batch_size_per_device=args.batch_size_per_gpu or datasets_cfg.get("batch_size_per_gpu", 38_400),
        batch_size_type=datasets_cfg.get("batch_size_type", "frame"),
        max_samples=args.max_samples or datasets_cfg.get("max_samples", 64),
        save_per_updates=ckpts_cfg.get("save_per_updates", 50_000),
        keep_last_n_checkpoints=ckpts_cfg.get("keep_last_n_checkpoints", -1),
        last_per_updates=ckpts_cfg.get("last_per_updates", 5_000),
        logger=ckpts_cfg.get("logger"),
        mesh=mesh,
        seed=666,
        zero1=args.zero1,
        tensor_parallel=args.tensor_parallel > 1,
        pipeline_microbatches=n_micro,
        sequence_parallel=args.sequence_parallel > 1,
    )
    backbone = get_backbone(model_cfg.arch)
    if args.pretrain:
        if args.pretrain.endswith(".npz"):
            template = backbone.init(jax.random.PRNGKey(0), model_cfg.arch)
            params = ckpt_util.load_pytree(template, args.pretrain)
        else:
            state = ckpt_util.load_torch_state(args.pretrain)
            params = ckpt_util.params_from_state(state, model_cfg.arch)
    else:
        params = backbone.init(jax.random.PRNGKey(0), model_cfg.arch)
    trainer.train(params, dataset, epochs=epochs, resume=True)


if __name__ == "__main__":
    main()
