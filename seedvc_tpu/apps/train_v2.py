"""v2 fine-tuning CLI: analogue of the reference ``accelerate launch
train_v2.py`` (``train_v2.py:1030-1065`` argparse surface).

Trains the AR accent model and/or the CFM decoder over BSQ content tokens;
multi-device data/tensor parallelism comes from the (data, model) mesh
inside :class:`TrainerV2` (SPMD shardings, not DDP).

    python -m seedvc_tpu.apps.train_v2 --dataset-dir ./my_voice \
        --run-name v2run --max-steps 1000 --train-ar 1 --train-cfm 1
"""

from __future__ import annotations

import argparse
import os
import pickle

from seedvc_tpu.core.utils import str2bool


def main(argv=None):
    ap = argparse.ArgumentParser(description="seedvc_tpu v2 fine-tuning")
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--run-name", default="v2run")
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--max-steps", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--base-lr", type=float, default=1e-4)
    ap.add_argument("--warmup-steps", type=int, default=100)
    ap.add_argument("--grad-clip", type=float, default=1000.0)
    ap.add_argument("--train-ar", type=str2bool, default=True)
    ap.add_argument("--train-cfm", type=str2bool, default=True)
    ap.add_argument("--save-interval", type=int, default=500)
    ap.add_argument("--log-interval", type=int, default=10)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="converted frozen-encoder .pkl trees "
                         "(ssl/narrow/wide/campplus)")
    ap.add_argument("--n-model", type=int, default=1,
                    help="tensor-parallel width of the device mesh")
    ap.add_argument("--fsdp", action="store_true",
                    help="scatter params/optimizer moments over the data "
                         "axis (ZeRO-3 analogue; composes with --n-model)")
    args = ap.parse_args(argv)

    from seedvc_tpu.pipelines.convert_v2 import V2Config
    from seedvc_tpu.train.dataset import FTDataset
    from seedvc_tpu.train.trainer_v2 import TrainerV2, TrainerV2Config

    frozen = {}
    if args.checkpoint_dir:
        for name in ("ssl", "narrow", "wide", "campplus"):
            path = os.path.join(args.checkpoint_dir, f"{name}.pkl")
            if os.path.exists(path):
                with open(path, "rb") as f:
                    frozen[name] = pickle.load(f)

    vcfg = V2Config()
    tcfg = TrainerV2Config(
        batch_size=args.batch_size,
        max_steps=args.max_steps,
        epochs=args.epochs,
        base_lr=args.base_lr,
        warmup_steps=args.warmup_steps,
        grad_clip=args.grad_clip,
        train_ar=args.train_ar,
        train_cfm=args.train_cfm,
        run_dir=f"./runs/{args.run_name}",
        save_interval=args.save_interval,
        log_interval=args.log_interval,
        fsdp=args.fsdp,
    )
    trainer = TrainerV2(vcfg, tcfg, frozen_params=frozen or None,
                        n_model=args.n_model)
    if trainer.restore_latest():
        print(f"resumed from step {int(trainer.state.step)}")

    dataset = FTDataset(args.dataset_dir, vcfg.sr, args.batch_size)
    final = trainer.train(dataset)
    print(f"done at step {final}")


if __name__ == "__main__":
    main()
