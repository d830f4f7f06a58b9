"""Training entrypoint (the reference's `python model/main.py`).

Usage:
  python -m pesto_tpu.apps.train_cli --dataset data.h5 --out save/run1 \
      [--model i_v4_1] [--train-sel train.txt --test-sel test.txt] \
      [--epochs 100 --lr 1e-5 --atoms-per-batch 16384]
"""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--model", default="i_v4_1")
    parser.add_argument("--train-sel", default=None)
    parser.add_argument("--test-sel", default=None)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--lr-schedule", default="constant",
                        choices=["constant", "cosine", "warmup_cosine"])
    parser.add_argument("--warmup-steps", type=int, default=0)
    parser.add_argument("--total-steps", type=int, default=1_000_000)
    parser.add_argument("--atoms-per-batch", type=int, default=16384)
    parser.add_argument("--max-batch", type=int, default=32)
    parser.add_argument("--log-step", type=int, default=1024)
    parser.add_argument("--eval-step", type=int, default=1024 * 8)
    parser.add_argument("--eval-size", type=int, default=1024)
    parser.add_argument("--max-size", type=int, default=8192)
    parser.add_argument("--min-num-res", type=int, default=48)
    parser.add_argument("--no-reload", action="store_true")
    parser.add_argument("--no-mesh", action="store_true")
    parser.add_argument("--bf16", action="store_true",
                        help="deprecated: bf16 compute is the default; see --fp32")
    parser.add_argument("--fp32", action="store_true",
                        help="full-fp32 compute + per-layer remat (round-1 behavior); "
                             "default is bf16 compute / fp32 master weights with the "
                             "dots_nb remat policy and one-hot gather tables "
                             "(2.2x faster, convergence validated)")
    parser.add_argument("--num-workers", type=int, default=8,
                        help="loader worker processes (reference model/main.py:37)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--init-from-torch", default=None, help="warm start from a reference .pt")
    args = parser.parse_args(argv)

    from ..models import get_config
    from ..train.loop import TrainConfig, train
    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    cfg = get_config(args.model)
    if not args.fp32:
        cfg = cfg.replace(dtype="bfloat16", precision="default", remat_policy="dots_nb")

    tc = TrainConfig(
        dataset_filepath=args.dataset,
        train_selection_filepath=args.train_sel,
        test_selection_filepath=args.test_sel,
        num_epochs=args.epochs,
        learning_rate=args.lr,
        lr_schedule=args.lr_schedule,
        warmup_steps=args.warmup_steps,
        total_steps=args.total_steps,
        atoms_per_batch=args.atoms_per_batch,
        max_batch=args.max_batch,
        log_step=args.log_step,
        eval_step=args.eval_step,
        eval_size=args.eval_size,
        max_size=args.max_size,
        min_num_res=args.min_num_res,
        reload=not args.no_reload,
        use_mesh=not args.no_mesh,
        seed=args.seed,
        num_workers=args.num_workers,
        gather_tables=not args.fp32,
    )

    init_params = None
    if args.init_from_torch:
        from ..port import load_reference_checkpoint

        init_params = load_reference_checkpoint(args.init_from_torch, cfg)

    train(cfg, tc, args.out, init_params_from=init_params)


if __name__ == "__main__":
    main()
