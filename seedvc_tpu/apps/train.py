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
    ap.add_argument("--checkpoint-dir", default=None,
                    help="directory of converted .pkl trees (vc.pkl is the "
                         "pretrained DiT/CFM to fine-tune — the analogue of "
                         "the reference's --pretrained-ckpt; whisper/campplus/"
                         "openvoice/rmvpe/se_db .pkl are picked up when "
                         "present)")
    ap.add_argument("--val-dataset-dir", default=None,
                    help="held-out audio directory for validation "
                         "(reference train.py --val-dataset-dir)")
    ap.add_argument("--validation-interval", type=int, default=0,
                    help="steps between validations (0 = off)")
    ap.add_argument("--patience", type=int, default=10,
                    help="validations without improvement before early stop "
                         "(reference train.py --patience)")
    ap.add_argument("--weight-ema-decay", type=float, default=0.0,
                    help="maintain a parameter EMA and export it for serving "
                         "(the reference ships _ema.pth weights; 0 = off)")
    ap.add_argument("--export-dir", default=None,
                    help="where to write the final serving vc.pkl (default "
                         "runs/<run-name>/ft_model; point it at your "
                         "converted base checkpoint dir to serve the "
                         "fine-tune directly)")
    ap.add_argument("--n-model", type=int, default=1,
                    help="tensor-parallel width of the device mesh")
    ap.add_argument("--fsdp", action="store_true",
                    help="scatter params/optimizer moments over the data "
                         "axis (ZeRO-3 analogue; composes with --n-model)")
    ap.add_argument("--compute-dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="bfloat16 = bf16 model compute, f32 master weights")
    args = ap.parse_args(argv)

    import os
    import pickle

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
        validation_interval=args.validation_interval,
        early_stop_patience=args.patience,
        weight_ema_decay=args.weight_ema_decay,
        fsdp=args.fsdp,
        compute_dtype=args.compute_dtype,
    )
    params = {}
    if args.checkpoint_dir:
        for name, kw in (("vc", "vc_params"), ("whisper", "whisper_params"),
                         ("campplus", "campplus_params"),
                         ("openvoice", "openvoice_params"),
                         ("rmvpe", "rmvpe_params"), ("se_db", "se_db")):
            path = os.path.join(args.checkpoint_dir, f"{name}.pkl")
            if os.path.exists(path):
                with open(path, "rb") as f:
                    params[kw] = pickle.load(f)
    trainer = Trainer(cfg, tcfg, n_model=args.n_model, **params)
    if trainer.restore_latest():
        print(f"resumed from step {int(trainer.state.step)}")
    dataset = FTDataset(args.dataset_dir, cfg.preprocess_params.sr,
                        args.batch_size)
    val_dataset = None
    if args.val_dataset_dir:
        val_dataset = FTDataset(args.val_dataset_dir,
                                cfg.preprocess_params.sr, args.batch_size)
        if not args.validation_interval:
            print("[warn] --val-dataset-dir given but --validation-interval "
                  "is 0; validation will not run")
    final = trainer.train(dataset, val_dataset)
    serving = trainer.export_serving(args.export_dir)
    print(f"done at step {final}; serving weights: {serving} "
          "(use its directory as --checkpoint-dir for apps.infer / webui / "
          "realtime)")


if __name__ == "__main__":
    main()
