"""Fine-tuning CLI (v1): analogue of the reference ``python train.py``.

    python -m seedvc_tpu.apps.train --dataset-dir ./my_voice \
        --run-name my_run --max-steps 1000 --batch-size 2
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description="seedvc_tpu fine-tuning")
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--run-name", default="run1")
    ap.add_argument("--preset", default="whisper_small_wavenet")
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--max-steps", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--base-lr", type=float, default=1e-4)
    ap.add_argument("--save-interval", type=int, default=500)
    ap.add_argument("--log-interval", type=int, default=10)
    ap.add_argument("--n-model", type=int, default=1,
                    help="tensor-parallel width of the device mesh")
    ap.add_argument("--fsdp", action="store_true",
                    help="scatter params/optimizer moments over the data "
                         "axis (ZeRO-3 analogue; composes with --n-model)")
    ap.add_argument("--compute-dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="bfloat16 = bf16 model compute, f32 master weights")
    args = ap.parse_args(argv)

    from seedvc_tpu.core.config import get_preset
    from seedvc_tpu.train.dataset import FTDataset
    from seedvc_tpu.train.trainer import Trainer, TrainerConfig

    cfg = get_preset(args.preset)
    tcfg = TrainerConfig(
        data_path=args.dataset_dir,
        run_dir=f"./runs/{args.run_name}",
        batch_size=args.batch_size,
        epochs=args.epochs,
        max_steps=args.max_steps,
        base_lr=args.base_lr,
        save_interval=args.save_interval,
        log_interval=args.log_interval,
        fsdp=args.fsdp,
        compute_dtype=args.compute_dtype,
    )
    trainer = Trainer(cfg, tcfg, n_model=args.n_model)
    if trainer.restore_latest():
        print(f"resumed from step {int(trainer.state.step)}")
    dataset = FTDataset(args.dataset_dir, cfg.preprocess_params.sr,
                        args.batch_size)
    final = trainer.train(dataset)
    print(f"done at step {final}")


if __name__ == "__main__":
    main()
