"""Precise epochs<->updates arithmetic accounting for the residual batch
(reference scripts/count_max_epoch_precise.py): uses the actual number of
packed batches from DynamicBatchSampler instead of the frames ratio."""

import json
import sys

sys.path.insert(0, ".")


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--dataset_dir", required=True, help="dir with duration.json")
    p.add_argument("--frames_per_device", type=int, default=38_400)
    p.add_argument("--max_samples", type=int, default=64)
    p.add_argument("--num_devices", type=int, default=8)
    p.add_argument("--wanted_updates", type=int, default=1_250_000)
    args = p.parse_args()

    with open(f"{args.dataset_dir}/duration.json") as f:
        durations = json.load(f)["duration"]

    class _DS:
        def __init__(self, durs):
            self.durs = durs

        def __len__(self):
            return len(self.durs)

        def get_frame_len(self, i):
            return self.durs[i] * 24000 / 256

    from f5_tts_tpu.train.dataset import DynamicBatchSampler

    sampler = DynamicBatchSampler(_DS(durations), args.frames_per_device, args.max_samples)
    per_epoch = len(sampler) / args.num_devices
    print(f"batches per epoch per device: {per_epoch:.0f}")
    print(f"epochs for {args.wanted_updates} updates: {args.wanted_updates / per_epoch:.2f}")


if __name__ == "__main__":
    main()
